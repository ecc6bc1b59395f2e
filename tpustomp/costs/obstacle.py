"""Obstacle cost: CHOMP potential over SDF distances at FK sphere bodies.

Reference equivalents (SURVEY §4.3/§4.4 — the hot inner loop):
``StompOptimizer::performForwardKinematics`` + ``getCollisionPointPotential``
evaluating, per waypoint and per collision sphere, the potential of the
signed EDT distance scaled by workspace speed (arc-length weighting).

Contract: SURVEY Appendix A.4 (potential) and A.5 (velocity-scaled cost).
The whole thing is pure array code: FK for all N+2 waypoints at once (vmap),
one batched SDF query for [N+2, B] points, reductions over bodies.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpustomp.robot.fk import body_positions_traj
from tpustomp.robot.model import RobotSpec
from tpustomp.world.sdf import safe_norm, sdf


def potential(d_signed: jnp.ndarray, eps: float) -> jnp.ndarray:
    """CHOMP obstacle potential, C^1 at d=0 and d=eps (A.4).

    The eps<=0 guard makes a direct call with zero clearance a hinge
    (-d)+ instead of 0/0=NaN at d==0 (PlannerConfig additionally rejects
    collision_clearance<=0 at construction)."""
    quad_den = jnp.where(eps > 0.0, 2.0 * eps, 1.0)
    return jnp.where(
        d_signed < 0.0,
        -d_signed + 0.5 * eps,
        jnp.where(d_signed <= eps,
                  (d_signed - eps) ** 2 / quad_den,
                  0.0),
    )


def potential_deriv(d_signed: jnp.ndarray, eps: float) -> jnp.ndarray:
    """d potential / d distance (for the CHOMP workspace gradient, A.11)."""
    den = jnp.where(eps > 0.0, eps, 1.0)
    return jnp.where(
        d_signed < 0.0, -1.0,
        jnp.where(d_signed <= eps, (d_signed - eps) / den, 0.0),
    )


def workspace_velocity(pos: jnp.ndarray, dt) -> jnp.ndarray:
    """Central-difference body velocities over the waypoint axis.

    pos: [N+2, B, 3] -> vel [N+2, B, 3]; one-sided at the ends (matches the
    CPU oracle's workspace_velocity).
    """
    interior = (pos[2:] - pos[:-2]) / (2.0 * dt)
    first = (pos[1:2] - pos[0:1]) / dt
    last = (pos[-1:] - pos[-2:-1]) / dt
    return jnp.concatenate([first, interior, last], axis=0)


def body_world_positions(robot: RobotSpec, full_traj: jnp.ndarray) -> jnp.ndarray:
    """FK sphere positions for all true waypoints. full_traj [N+2, d] -> [N+2, B, 3]."""
    return body_positions_traj(robot, full_traj)


def obstacle_cost(robot: RobotSpec, world, full_traj: jnp.ndarray,
                  dt: float, clearance: float):
    """Per-waypoint obstacle cost and clearance margin.

    Returns (q_obs [N+2], min_margin scalar) where min_margin is the minimum
    signed distance (beyond radius+0) over all bodies/waypoints — used by the
    collision-free termination test (A.12).
    """
    pos = body_world_positions(robot, full_traj)              # [N+2, B, 3]
    vel = workspace_velocity(pos, dt)
    # safe_norm: forward-identical to linalg.norm; keeps the exact-CHOMP
    # autodiff path (engine/chomp.py) NaN-free for stationary bodies
    speed = safe_norm(vel)                                    # [N+2, B]
    dist = sdf(world, pos)                                    # [N+2, B]
    d_sig = dist - robot.body_radius[None, :] - clearance
    q = jnp.sum(potential(d_sig, clearance) * speed, axis=-1) * dt
    margin = jnp.min(dist - robot.body_radius[None, :])
    return q, margin
