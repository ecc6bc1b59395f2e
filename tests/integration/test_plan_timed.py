"""plan_timed: the reference planning_time_limit failsafe (SURVEY §6)."""

import numpy as np
import jax

from tpustomp.api.config import PlannerConfig, NoiseConfig, CostWeights
from tpustomp.api.plan import plan, plan_timed
from tpustomp.api.problem import ProblemSpec
from tpustomp.robot import model
from tpustomp.world.sdf import AnalyticWorld

Q0 = np.array([-0.56, 1.65], np.float32)
QN = np.array([1.16, -1.46], np.float32)


def _setup(**kw):
    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[((1.88, 0.42, 0.0), 0.27)])
    base = dict(
        num_timesteps=20, duration=2.1, num_rollouts=10,
        noise=NoiseConfig(stddev=0.25, decay=0.995, num_rollouts_reused=3),
        weights=CostWeights(obstacle=1.0, smoothness=0.1),
        collision_clearance=0.1, max_iterations=150,
        max_iterations_after_collision_free=5,
    )
    base.update(kw)
    return robot, world, PlannerConfig(**base)


def test_timed_matches_untimed_when_budget_ample():
    robot, world, cfg = _setup(planning_time_limit=60.0)
    prob = ProblemSpec(q0=Q0, qN=QN)
    a = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(0))
    b = plan_timed(robot, world, prob, cfg, key=jax.random.PRNGKey(0))
    assert bool(a.success) == bool(b.success)
    assert int(a.iterations) == int(b.iterations)
    np.testing.assert_allclose(np.asarray(a.trajectory),
                               np.asarray(b.trajectory), atol=1e-6)


def test_timed_honors_num_restarts():
    """plan_timed with num_restarts=R must run R independent noise streams
    and select_best — identical to plan() when the wall budget is ample
    (r4 ADVICE: plan_timed silently ignored num_restarts)."""
    robot, world, cfg = _setup(planning_time_limit=60.0, num_restarts=3)
    prob = ProblemSpec(q0=Q0, qN=QN)
    a = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(4))
    b = plan_timed(robot, world, prob, cfg, key=jax.random.PRNGKey(4))
    assert bool(a.success) == bool(b.success)
    np.testing.assert_allclose(np.asarray(a.trajectory),
                               np.asarray(b.trajectory), atol=1e-6)
    # different jitted programs (whole-solve vmap vs chunked vmap) may fuse
    # differently on CPU — ULP-level, not semantic
    np.testing.assert_allclose(float(a.cost), float(b.cost), rtol=1e-5)


def test_timed_returns_best_so_far_on_budget_exhaustion():
    """Zero wall budget ⇒ one chunk runs, then best-so-far is returned."""
    robot, world, cfg = _setup(planning_time_limit=0.0)
    prob = ProblemSpec(q0=Q0, qN=QN)
    sol = plan_timed(robot, world, prob, cfg, key=jax.random.PRNGKey(0),
                     chunk_iterations=3)
    assert int(sol.iterations) <= 3
    traj = np.asarray(sol.trajectory)
    np.testing.assert_allclose(traj[0], Q0, atol=1e-6)
    np.testing.assert_allclose(traj[-1], QN, atol=1e-6)
    assert np.all(np.isfinite(traj))
