"""CHOMP property tests (SURVEY §5.3): on a convex quadratic (obstacle-free)
problem the preconditioned update matches closed-form gradient descent."""

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.api.config import PlannerConfig, CostWeights
from tpustomp.dynamics.device import device_ops
from tpustomp.engine.chomp import chomp_delta
from tpustomp.engine.trajectory import full_trajectory, min_jerk_init
from tpustomp.robot import model
from tpustomp.world.sdf import AnalyticWorld


def test_chomp_on_quadratic_bowl_matches_closed_form():
    """Empty world ⇒ gradient = w_s(Rθ + R_bias q) ⇒ update
    θ' = θ − η·w_s·(θ − θ*), θ* = −R⁻¹R_bias q — exact geometric decay."""
    robot = model.planar_2r()
    world = AnalyticWorld.make(spheres=[((50.0, 50.0, 0.0), 0.1)])  # far away
    cfg = PlannerConfig(num_timesteps=15, duration=1.6,
                        weights=CostWeights(obstacle=1.0, smoothness=0.5),
                        learning_rate=0.3, chomp_joint_update_limit=1e9)
    ops = device_ops(cfg.num_timesteps, cfg.dt, cfg.smoothness)
    q0 = jnp.asarray([0.2, -0.5])
    qN = jnp.asarray([1.0, 0.7])
    theta = min_jerk_init(q0, qN, cfg.num_timesteps) + 0.3

    q = np.stack([np.asarray(q0), np.asarray(qN)])
    theta_star = np.linalg.solve(np.asarray(ops.R, np.float64),
                                 -np.asarray(ops.R_bias, np.float64) @ q)

    th = theta
    rate = 1.0 - cfg.learning_rate * cfg.weights.smoothness
    th_np = np.asarray(theta, np.float64)
    for i in range(20):
        full = full_trajectory(th, q0, qN)
        delta = chomp_delta(ops, robot, world, th, q0, qN, full, cfg.dt,
                            cfg.collision_clearance, cfg.weights.obstacle,
                            cfg.weights.smoothness, cfg.learning_rate)
        th = th + delta
        th_np = theta_star + rate * (th_np - theta_star)
        np.testing.assert_allclose(np.asarray(th), th_np, atol=2e-4,
                                   err_msg=f"iteration {i}")
    # converged near the smoothness minimizer
    assert np.abs(np.asarray(th) - theta_star).max() < 0.12


def test_chomp_gradient_descends_cost():
    """One CHOMP step on a colliding trajectory reduces the weighted cost."""
    from tpustomp.engine import solver

    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[((1.88, 0.42, 0.0), 0.27)])
    cfg = PlannerConfig(num_timesteps=20, duration=2.1, mode="chomp",
                        learning_rate=0.2,
                        weights=CostWeights(obstacle=50.0, smoothness=0.1),
                        collision_clearance=0.1)
    ops = device_ops(cfg.num_timesteps, cfg.dt, cfg.smoothness)
    q0 = jnp.asarray([-0.56, 1.65])
    qN = jnp.asarray([1.16, -1.46])
    theta = min_jerk_init(q0, qN, cfg.num_timesteps)

    def total(th):
        _, _, _, tot, _ = solver._evaluate(robot, world, None, cfg, ops,
                                           q0, qN, th)
        return float(tot)

    full = full_trajectory(theta, q0, qN)
    delta = chomp_delta(ops, robot, world, theta, q0, qN, full, cfg.dt,
                        cfg.collision_clearance, cfg.weights.obstacle,
                        cfg.weights.smoothness, cfg.learning_rate)
    assert total(theta + delta) < total(theta)


def test_dls_solve3_matches_numpy():
    """Closed-form damped 3x3 solve == numpy solve of (JJ^T + ridge I)."""
    from tpustomp.engine.chomp import _dls_solve3

    rng = np.random.default_rng(7)
    J = rng.normal(size=(5, 4, 3, 6)).astype(np.float32)
    b = rng.normal(size=(5, 4, 3)).astype(np.float32)
    ridge = 1e-3
    got = np.asarray(_dls_solve3(jnp.asarray(J), jnp.asarray(b), ridge))
    G = J @ np.swapaxes(J, -1, -2) + ridge * np.eye(3, dtype=np.float32)
    want = np.linalg.solve(G.astype(np.float64), b[..., None].astype(np.float64))[..., 0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_chomp_pseudo_inverse_large_ridge_limit():
    """λ→∞: J^T(JJ^T+λI)⁻¹ws → J^T ws / λ, so the pinv obstacle gradient
    times λ must converge to the plain J^T gradient (and differ at λ=1e-4)."""
    from tpustomp.engine.chomp import obstacle_functional_gradient

    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[((1.88, 0.42, 0.0), 0.27)])
    q0 = jnp.asarray([-0.56, 1.65])
    qN = jnp.asarray([1.16, -1.46])
    theta = min_jerk_init(q0, qN, 20)
    full = full_trajectory(theta, q0, qN)
    dt = 0.1

    g_plain = obstacle_functional_gradient(robot, world, full, dt, 0.1)
    lam = 1e6
    g_lim = obstacle_functional_gradient(robot, world, full, dt, 0.1,
                                         use_pseudo_inverse=True,
                                         pinv_ridge=lam) * lam
    np.testing.assert_allclose(np.asarray(g_lim), np.asarray(g_plain),
                               rtol=1e-3, atol=1e-6)
    g_pinv = obstacle_functional_gradient(robot, world, full, dt, 0.1,
                                          use_pseudo_inverse=True,
                                          pinv_ridge=1e-4)
    # at a realistic ridge the direction genuinely differs from the J^T map
    cos = (np.sum(np.asarray(g_pinv) * np.asarray(g_plain))
           / (np.linalg.norm(g_pinv) * np.linalg.norm(g_plain)))
    assert cos < 0.999


def test_chomp_pseudo_inverse_full_solve_converges():
    """End-to-end CHOMP plan with use_pseudo_inverse reaches collision-free."""
    from tpustomp.api.plan import plan
    from tpustomp.api.problem import ProblemSpec

    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[((1.88, 0.42, 0.0), 0.27)])
    cfg = PlannerConfig(num_timesteps=20, duration=2.1, mode="chomp",
                        learning_rate=0.25, use_pseudo_inverse=True,
                        weights=CostWeights(obstacle=50.0, smoothness=0.1),
                        collision_clearance=0.1, max_iterations=150,
                        max_iterations_after_collision_free=3)
    q0 = jnp.asarray([-0.56, 1.65])
    qN = jnp.asarray([1.16, -1.46])
    sol = plan(robot, world, ProblemSpec(q0=q0, qN=qN), cfg,
               key=jax.random.PRNGKey(0))
    assert bool(sol.success)
