"""Goal-constraint tolerance bands (L6 adapter surface).

Reference equivalent: ``planKinematicPath`` extracting
``req.goal_constraints.joint_constraints`` — a position per joint plus
tolerance_above/below; any endpoint within the band satisfies the goal
(SURVEY §4.2 [M]). VERDICT r2 item 7: a goal reachable only within
tolerance must plan successfully, and wraparound must compose with the
band.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.api.config import PlannerConfig, NoiseConfig
from tpustomp.api.plan import plan, plan_batch, resolve_goal_tolerance
from tpustomp.api.problem import ProblemSpec
from tpustomp.robot import model
from tpustomp.world.sdf import AnalyticWorld

Q0 = np.array([1.8, -0.6], np.float32)
QN = np.array([0.0, 0.0], np.float32)   # EE at (2, 0, 0) — inside the sphere


def _cfg(**kw):
    return PlannerConfig(
        num_timesteps=20, duration=2.1, num_rollouts=10,
        noise=NoiseConfig(stddev=0.25, decay=1.0, num_rollouts_reused=2),
        collision_clearance=0.1, max_iterations=40,
        max_iterations_after_collision_free=3, record_metrics=False, **kw)


def _goal_blocked_world():
    # sphere centered exactly on the nominal goal's EE position
    return AnalyticWorld.make(spheres=[((2.0, 0.0, 0.0), 0.25)])


def test_goal_in_collision_fails_without_tolerance():
    robot = model.planar_2r(body_radius=0.05)
    sol = plan(robot, _goal_blocked_world(), ProblemSpec(q0=Q0, qN=QN),
               _cfg(), key=jax.random.PRNGKey(0))
    assert not bool(sol.success), (
        "endpoint fixed inside the obstacle must never be collision-free")


def test_goal_reachable_only_within_tolerance_succeeds():
    robot = model.planar_2r(body_radius=0.05)
    tol = np.array([0.6, 0.6], np.float32)
    prob = ProblemSpec(q0=Q0, qN=QN, goal_tolerance_below=tol,
                       goal_tolerance_above=tol)
    sol = plan(robot, _goal_blocked_world(), prob, _cfg(),
               key=jax.random.PRNGKey(0))
    assert bool(sol.success)
    qend = np.asarray(sol.trajectory[-1])
    # endpoint inside the band, and NOT the (infeasible) nominal
    assert np.all(qend >= QN - tol - 1e-5) and np.all(qend <= QN + tol + 1e-5)
    assert np.linalg.norm(qend - QN) > 1e-3
    # and actually clear of the obstacle
    from tpustomp.robot.fk import body_positions
    from tpustomp.world.sdf import sdf
    m = float(jnp.min(sdf(_goal_blocked_world(),
                          body_positions(robot, jnp.asarray(qend)))
                      - robot.body_radius))
    assert m > 0.0


def test_feasible_nominal_goal_is_kept_exactly():
    """A feasible nominal goal must win over every band candidate (candidate
    0 has distance 0), reproducing exact-goal reference behavior."""
    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[((0.0, 5.0, 0.0), 0.25)])  # far away
    cfg = _cfg()
    qsel = resolve_goal_tolerance(robot, world, cfg, jnp.asarray(Q0),
                                  jnp.asarray(QN),
                                  jnp.full((2,), 0.6), jnp.full((2,), 0.6))
    np.testing.assert_allclose(np.asarray(qsel), QN, atol=1e-7)


def test_wraparound_composes_with_band():
    """The band rides the WRAPPED goal: qN given 2π away selects an endpoint
    near q0 + delta, not near the raw qN."""
    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[((0.0, 5.0, 0.0), 0.25)])
    cfg = _cfg()
    q0 = jnp.asarray(Q0)
    qN_far = q0 + jnp.asarray([2.0 * np.pi + 0.1, 0.2])
    qsel = resolve_goal_tolerance(robot, world, cfg, q0, qN_far,
                                  jnp.full((2,), 0.3), jnp.full((2,), 0.3))
    np.testing.assert_allclose(np.asarray(qsel),
                               np.asarray(q0) + [0.1, 0.2], atol=1e-5)


def test_goal_tolerance_batched():
    robot = model.planar_2r(body_radius=0.05)
    world = _goal_blocked_world()
    B = 4
    tol = np.array([0.6, 0.6], np.float32)
    prob = ProblemSpec(
        q0=np.tile(Q0, (B, 1)), qN=np.tile(QN, (B, 1)),
        goal_tolerance_below=tol, goal_tolerance_above=tol)  # [d] broadcasts
    sols = plan_batch(robot, world, prob, _cfg(),
                      keys=jax.random.split(jax.random.PRNGKey(0), B))
    assert np.asarray(sols.success).all()
    qend = np.asarray(sols.trajectory[:, -1])
    assert np.all(np.abs(qend - QN) <= tol + 1e-5)


def test_plan_sharded_honors_goal_tolerance():
    """The mesh path must resolve the band exactly as plan_batch (round-5
    fix: plan_sharded previously used the raw nominal, so the same
    problems changed results the moment a user scaled out)."""
    from tpustomp.engine.distributed import make_mesh, plan_sharded

    robot = model.planar_2r(body_radius=0.05)
    B = 8
    tol = np.tile(np.array([0.6, 0.6], np.float32), (B, 1))
    prob = ProblemSpec(q0=np.tile(Q0, (B, 1)), qN=np.tile(QN, (B, 1)),
                       goal_tolerance_below=tol, goal_tolerance_above=tol)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    ref = plan_batch(robot, _goal_blocked_world(), prob, _cfg(), keys=keys)
    sh = plan_sharded(robot, _goal_blocked_world(), prob, _cfg(),
                      keys=keys, mesh=make_mesh())
    assert np.asarray(sh.success).all()
    np.testing.assert_array_equal(np.asarray(sh.trajectory),
                                  np.asarray(ref.trajectory))


def test_tune_honors_goal_tolerance():
    """tune() must score cells on the band-resolved goals plan_batch will
    actually solve (round-5 fix): with the nominal goal in collision but
    the band feasible, every cell should show non-zero success."""
    from tpustomp.api.tune import tune

    robot = model.planar_2r(body_radius=0.05)
    B = 4
    tol = np.tile(np.array([0.6, 0.6], np.float32), (B, 1))
    prob = ProblemSpec(q0=np.tile(Q0, (B, 1)), qN=np.tile(QN, (B, 1)),
                       goal_tolerance_below=tol, goal_tolerance_above=tol)
    res = tune(robot, _goal_blocked_world(), prob, _cfg(),
               noise_scale=(1.0,), h=(10.0,), decay=(1.0,))
    (metrics,) = res.table.values()
    assert metrics["success_rate"] > 0.5
