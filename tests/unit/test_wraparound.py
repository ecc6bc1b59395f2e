"""Continuous-joint wraparound (reference: stomp_utils.h angle normalization
+ wrap-around flags in StompRobotModel; SURVEY §3.1). A goal specified 2π
away must plan the identical (shortest) path, and a goal 350° away must take
the −10° path."""

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.api.config import CostWeights, NoiseConfig, PlannerConfig
from tpustomp.api.plan import plan
from tpustomp.api.problem import ProblemSpec
from tpustomp.engine.trajectory import wrap_goal
from tpustomp.robot import model
from tpustomp.world.sdf import AnalyticWorld


def test_wrap_goal_shortest_path():
    limited = jnp.asarray([False, False, True])
    q0 = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    qN = jnp.asarray([np.deg2rad(350.0), -3 * np.pi / 2, np.deg2rad(350.0)],
                     jnp.float32)
    out = np.asarray(wrap_goal(q0, qN, limited))
    np.testing.assert_allclose(out[0], np.deg2rad(-10.0), atol=1e-6)
    np.testing.assert_allclose(out[1], np.pi / 2, atol=1e-6)
    # limited joint passes through unchanged even if far away
    np.testing.assert_allclose(out[2], np.deg2rad(350.0), atol=1e-6)


def test_wrap_goal_idempotent_and_endpoint_exact():
    rng = np.random.default_rng(3)
    q0 = jnp.asarray(rng.uniform(-np.pi, np.pi, 5), jnp.float32)
    qN = jnp.asarray(rng.uniform(-9, 9, 5), jnp.float32)
    limited = jnp.zeros(5, bool)
    w1 = wrap_goal(q0, qN, limited)
    w2 = wrap_goal(q0, w1, limited)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-6)
    # wrapped goal is the same physical configuration (mod 2π)
    np.testing.assert_allclose(
        np.mod(np.asarray(w1 - qN) + 1e-4, 2 * np.pi), 1e-4, atol=1e-3)


def _plan(qN_offset):
    robot = model.planar_2r(body_radius=0.05)  # both joints continuous
    world = AnalyticWorld.make(spheres=[((1.2, 1.2, 0.0), 0.3)])
    cfg = PlannerConfig(
        num_timesteps=20, duration=2.1, num_rollouts=8, max_iterations=30,
        noise=NoiseConfig(stddev=0.2, decay=1.0, num_rollouts_reused=2),
        weights=CostWeights(obstacle=1.0, smoothness=0.1),
        collision_clearance=0.1, record_metrics=False)
    q0 = np.array([-0.5, 1.0], np.float32)
    qN = np.array([1.1, -1.2], np.float32) + qN_offset
    return plan(robot, world, ProblemSpec(q0=q0, qN=qN), cfg,
                key=jax.random.PRNGKey(0))


def test_goal_plus_2pi_plans_identically():
    base = _plan(0.0)
    shifted = _plan(2 * np.pi)
    np.testing.assert_allclose(np.asarray(base.trajectory),
                               np.asarray(shifted.trajectory), atol=1e-5)
    assert bool(base.success) and bool(shifted.success)


def test_far_goal_takes_short_path():
    """Goal 350° away on a continuous joint: the plan's total joint travel
    must be the −10° route, not the 350° sweep."""
    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[((5.0, 5.0, 0.0), 0.1)])  # far away
    cfg = PlannerConfig(
        num_timesteps=20, duration=2.1, num_rollouts=4, max_iterations=5,
        record_metrics=False)
    q0 = np.zeros(2, np.float32)
    qN = np.array([np.deg2rad(350.0), 0.0], np.float32)
    sol = plan(robot, world, ProblemSpec(q0=q0, qN=qN), cfg,
               key=jax.random.PRNGKey(0))
    traj = np.asarray(sol.trajectory)
    travel = np.abs(np.diff(traj[:, 0])).sum()
    assert travel < np.deg2rad(30.0), f"took the long way: {travel} rad"
