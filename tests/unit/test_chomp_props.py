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
