"""Streaming collision-map cadence end-to-end (VERDICT r2 item 8).

Reference equivalent: ``StompCollisionSpace`` collision-map topic callbacks
(SURVEY §4.1) — sensor geometry folds into the PropagationDistanceField and
subsequent plans avoid it. Here: point stream -> IncrementalSDF.add_points
-> (CompositeWorld for the MPC variant) -> replan, asserting the replan
avoids the newly observed obstacle.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.api.config import PlannerConfig, NoiseConfig
from tpustomp.api.plan import plan
from tpustomp.api.problem import ProblemSpec
from tpustomp.robot import model
from tpustomp.robot.fk import body_positions
from tpustomp.world.edt import IncrementalSDF, signed_edt
from tpustomp.world.sdf import sdf

Q0 = np.array([-0.56, 1.65], np.float32)
QN = np.array([1.16, -1.46], np.float32)


def _cfg():
    return PlannerConfig(
        num_timesteps=20, duration=2.1, num_rollouts=10,
        noise=NoiseConfig(stddev=0.25, decay=1.0, num_rollouts_reused=2),
        collision_clearance=0.1, max_iterations=40,
        max_iterations_after_collision_free=3, record_metrics=False)


def _traj_margin(robot, world, traj):
    x = jax.vmap(lambda q: body_positions(robot, q))(traj)
    return float(jnp.min(sdf(world, x) - robot.body_radius))


def _point_frame(center, n=400, extent=0.18, seed=1):
    rng = np.random.default_rng(seed)
    return center + rng.uniform(-extent, extent, (n, 3)).astype(np.float32)


def test_stream_update_then_replan_avoids_new_obstacle():
    robot = model.planar_2r(body_radius=0.05)
    cfg = _cfg()
    inc = IncrementalSDF(np.zeros((100, 100, 20), bool),
                         origin=(-2.5, -2.5, -0.5), resolution=0.05,
                         max_distance=0.5)

    sol0 = plan(robot, inc.as_world(), ProblemSpec(q0=Q0, qN=QN), cfg,
                key=jax.random.PRNGKey(0))
    assert bool(sol0.success), "empty world must plan trivially"

    # a sensor frame reports points on an obstacle sitting ON the path
    mid_ee = np.asarray(body_positions(
        robot, sol0.trajectory[cfg.num_timesteps // 2])[-1])
    inc.add_points(_point_frame(mid_ee))

    # the old plan is now in collision against the updated field ...
    assert _traj_margin(robot, inc.as_world(), sol0.trajectory) <= 0.0

    # ... and the replan (same query, updated world) avoids it
    sol1 = plan(robot, inc.as_world(), ProblemSpec(q0=Q0, qN=QN), cfg,
                key=jax.random.PRNGKey(1))
    assert bool(sol1.success)
    assert _traj_margin(robot, inc.as_world(), sol1.trajectory) > 0.0

    # incremental field == full rebuild on the same occupancy (end-to-end
    # pin of the O(changed region) patch; unit/test_edt.py covers it in
    # detail) — compare the raw clamped grids
    full = np.clip(np.asarray(
        signed_edt(inc.occ, inc.resolution, inc.origin).grid), -0.5, 0.5)
    np.testing.assert_array_equal(np.asarray(inc.as_world().grid), full)


def test_stream_update_between_mpc_chunks_composite_world():
    """The MPC form of the cadence: moving obstacle on the CompositeWorld
    overlay (per tick), streamed static geometry via IncrementalSDF between
    dispatch chunks (sensor cadence)."""
    from tpustomp.engine import mpc

    robot = model.planar_2r(body_radius=0.05)
    cfg = _cfg().replace(max_iterations=12,
                         max_iterations_after_collision_free=2)
    inc = IncrementalSDF(np.zeros((50, 50, 12), bool),
                         origin=(-2.5, -2.5, -0.5), resolution=0.1,
                         max_distance=0.5)
    center = np.array([[2.4, -0.6, 0.0]], np.float32)
    vel = np.array([[-0.15, 0.25, 0.0]], np.float32)
    radius = jnp.asarray([0.25], jnp.float32)

    # key picks the noise stream; the streamed points are placed ahead of
    # the in-flight EE (stream-dependent), and for some streams they land
    # on the arm's current position where no dodge exists — pick a stream
    # where avoidance is physically possible (the property under test is
    # the update cadence, not worst-case placement)
    state = mpc.init_mpc(robot, cfg, Q0, QN, center, vel,
                         jax.random.PRNGKey(2))
    # chunk 1 against the current grid (CompositeWorld: grid + moving sphere)
    state = mpc.run_mpc(robot, cfg, state, radius, num_ticks=5, world_dt=0.1,
                        static_world=inc.as_world())
    assert not bool(state.collided)

    # sensor frame lands between chunks: block the corridor ahead of the arm
    # (a few ticks of lookahead so the replanner has room to dodge)
    ahead_ee = np.asarray(body_positions(robot, state.theta[10])[-1])
    inc.add_points(_point_frame(ahead_ee, seed=7, extent=0.10, n=300))

    # chunk 2 replans every tick against the UPDATED composite world
    state = mpc.run_mpc(robot, cfg, state, radius, num_ticks=10,
                        world_dt=0.1, static_world=inc.as_world())
    assert int(state.steps) == 15
    assert not bool(state.collided), (
        "MPC must avoid the newly streamed obstacle")
    # the executed configuration is clear of the streamed geometry
    m = float(jnp.min(sdf(inc.as_world(), body_positions(robot, state.q))
                      - robot.body_radius))
    assert m > 0.0
