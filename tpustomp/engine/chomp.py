"""CHOMP functional-gradient step — the deterministic variant on the same kernels.

Reference equivalent: the ``ChompOptimizer`` lineage this package was forked
from (SURVEY §4.5); required by BASELINE config 3. Shares FK, SDF, potential,
R⁻¹/M, and joint-limit machinery with STOMP; only the update rule differs.

Contract: SURVEY Appendix A.11. Both forms are provided:
  - simplified: ∇q(t) = Σ_b J_bᵀ (pot'·∇d) ‖ẋ_b‖ dt
  - full CHOMP: ∇q(t) = Σ_b J_bᵀ ‖ẋ_b‖ [(I − x̂̇x̂̇ᵀ) pot'·∇d − pot·κ] dt with
    curvature κ = ‖ẋ‖⁻² (I − x̂̇x̂̇ᵀ) ẍ
plus the smoothness term Rθ + R_bias q; update θ ← θ − η·M·∇.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpustomp.costs.obstacle import potential, potential_deriv, workspace_velocity
from tpustomp.costs.smoothness import smoothness_gradient
from tpustomp.robot.fk import body_pos_jac_traj
from tpustomp.robot.model import RobotSpec
from tpustomp.world.sdf import sdf_grad

_SPEED_EPS = 1e-6


def obstacle_functional_gradient(robot: RobotSpec, world, full_traj: jnp.ndarray,
                                 dt: float, clearance: float,
                                 use_curvature: bool = True) -> jnp.ndarray:
    """∇_θ q_obs at the interior waypoints: [N, d] (A.11)."""
    x, J = body_pos_jac_traj(robot, full_traj)        # [T,B,3], [T,B,3,d]
    vel = workspace_velocity(x, dt)                   # [T,B,3]
    speed = jnp.linalg.norm(vel, axis=-1)             # [T,B]
    dist, grad_d = sdf_grad(world, x)                 # [T,B], [T,B,3]
    d_sig = dist - robot.body_radius[None, :] - clearance
    pd = potential_deriv(d_sig, clearance)            # [T,B]

    if use_curvature:
        xhat = vel / (speed[..., None] + _SPEED_EPS)
        proj = lambda v: v - xhat * jnp.sum(xhat * v, axis=-1, keepdims=True)
        accel = workspace_velocity(vel, dt)           # central diff of velocity
        kappa = proj(accel) / (speed[..., None] ** 2 + _SPEED_EPS)
        pot_val = potential(d_sig, clearance)
        ws = speed[..., None] * (proj(pd[..., None] * grad_d)
                                 - pot_val[..., None] * kappa) * dt
    else:
        ws = pd[..., None] * grad_d * speed[..., None] * dt

    # explicit multiply-add instead of einsum: the contraction dims (B, 3)
    # are tiny, so dot lowering would pad onto the MXU tile for nothing
    g = jnp.sum(ws[..., None] * J, axis=(1, 2))       # [T, d]
    return g[1:-1]                                    # interior rows only


def chomp_gradient(ops, robot: RobotSpec, world, theta: jnp.ndarray,
                   q0: jnp.ndarray, qN: jnp.ndarray, full_traj: jnp.ndarray,
                   dt: float, clearance: float, w_obstacle: float,
                   w_smoothness: float,
                   use_curvature: bool = True) -> jnp.ndarray:
    """Raw functional gradient ∇U = w_o ∇q_obs + w_s (Rθ + R_bias q): [N, d].

    Shared by the plain CHOMP update and the HMC leapfrog force term."""
    g_obs = obstacle_functional_gradient(robot, world, full_traj, dt,
                                         clearance, use_curvature)
    g_smooth = smoothness_gradient(ops, theta, q0, qN)
    return w_obstacle * g_obs + w_smoothness * g_smooth


def chomp_delta(ops, robot: RobotSpec, world, theta: jnp.ndarray,
                q0: jnp.ndarray, qN: jnp.ndarray, full_traj: jnp.ndarray,
                dt: float, clearance: float, w_obstacle: float,
                w_smoothness: float, learning_rate: float,
                use_curvature: bool = True) -> jnp.ndarray:
    """One CHOMP update direction: −η·R⁻¹·(w_o ∇q_obs + w_s (Rθ + R_bias q)).

    The R⁻¹ preconditioner makes the smoothness part an exact Newton step
    (R⁻¹(Rθ + R_bias q) = θ − θ*, the pull toward the smoothness minimizer),
    which is what keeps the covariant update stable — STOMP's column-scaled M
    would destroy that exactness and diverge (A.11).
    """
    grad = chomp_gradient(ops, robot, world, theta, q0, qN, full_traj, dt,
                          clearance, w_obstacle, w_smoothness, use_curvature)
    return -learning_rate * (ops.Rinv @ grad)
