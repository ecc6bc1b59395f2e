"""Pipelined serving stream + targeted failed-row retry (api/plan.py).

plan_batch_stream is the multi-host serving loop's per-host driver: results
must be identical to calling plan_batch per batch (pipelining only changes
WHEN host syncs happen, never what is computed). plan_batch_retry must keep
successful rows bit-identical and only ever improve the success mask.
"""

import numpy as np

import jax

from tpustomp.api.config import CostWeights, NoiseConfig, PlannerConfig
from tpustomp.api.plan import plan_batch, plan_batch_retry, plan_batch_stream
from tpustomp.api.problem import ProblemSpec
from tpustomp.robot import model
from tpustomp.world.sdf import AnalyticWorld


def _scene():
    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[((1.88, 0.42, 0.0), 0.27)])
    return robot, world


def _cfg(**kw):
    base = dict(
        num_timesteps=16, duration=1.7, num_rollouts=6,
        noise=NoiseConfig(stddev=0.25, decay=0.995, num_rollouts_reused=2),
        weights=CostWeights(obstacle=1.0, smoothness=0.1),
        collision_clearance=0.1, max_iterations=12,
        max_iterations_after_collision_free=4, record_metrics=False)
    base.update(kw)
    return PlannerConfig(**base)


def _problems(B, nbatches, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(nbatches):
        q0 = (np.tile([-0.56, 1.65], (B, 1))
              + rng.uniform(-0.05, 0.05, (B, 2))).astype(np.float32)
        qN = (np.tile([1.16, -1.46], (B, 1))
              + rng.uniform(-0.05, 0.05, (B, 2))).astype(np.float32)
        keys = jax.random.split(jax.random.PRNGKey(100 + i), B)
        out.append((ProblemSpec(q0=q0, qN=qN), keys))
    return out

def test_stream_matches_per_batch_plan_batch():
    robot, world = _scene()
    cfg = _cfg()
    items = _problems(B=6, nbatches=5)
    got = list(plan_batch_stream(robot, world, iter(items), cfg, depth=2,
                                 gather="serving"))
    assert len(got) == len(items)
    for (prob, keys), (traj, succ) in zip(items, got):
        ref = plan_batch(robot, world, prob, cfg, keys=keys)
        np.testing.assert_array_equal(succ, np.asarray(ref.success))
        np.testing.assert_allclose(traj, np.asarray(ref.trajectory),
                                   rtol=0, atol=0)


def test_stream_gather_modes():
    robot, world = _scene()
    cfg = _cfg()
    items = _problems(B=4, nbatches=3, seed=3)
    full = list(plan_batch_stream(robot, world, iter(items), cfg,
                                  gather="full"))
    raw = list(plan_batch_stream(robot, world, iter(items), cfg,
                                 gather="none"))
    assert len(full) == len(raw) == 3
    for f, r in zip(full, raw):
        assert isinstance(f.trajectory, np.ndarray)
        np.testing.assert_array_equal(f.trajectory, np.asarray(r.trajectory))


def test_stream_depth_does_not_change_results():
    robot, world = _scene()
    cfg = _cfg()
    items = _problems(B=4, nbatches=4, seed=7)
    a = list(plan_batch_stream(robot, world, iter(items), cfg, depth=1,
                               gather="serving"))
    b = list(plan_batch_stream(robot, world, iter(items), cfg, depth=3,
                               gather="serving"))
    for (ta, sa), (tb, sb) in zip(a, b):
        np.testing.assert_array_equal(ta, tb)
        np.testing.assert_array_equal(sa, sb)


def test_stream_depth_semantics(monkeypatch):
    """At most `depth` batches are resident in the pipeline at any moment —
    the serving loop's memory contract (r4 dispatched before draining and so
    kept depth+1 in flight). Spied at dispatch time: when batch i is
    dispatched, at most depth-1 earlier dispatches may still be unconsumed."""
    import tpustomp.api.plan as plan_mod

    robot, world = _scene()
    cfg = _cfg()
    items = _problems(B=4, nbatches=6, seed=13)
    depth = 2
    consumed = [0]
    resident_at_dispatch = []
    real = plan_mod.plan_batch

    def spy(*a, **k):
        resident_at_dispatch.append(len(resident_at_dispatch) - consumed[0])
        return real(*a, **k)

    monkeypatch.setattr(plan_mod, "plan_batch", spy)
    out = []
    for r in plan_batch_stream(robot, world, iter(items), cfg, depth=depth,
                               gather="serving"):
        consumed[0] += 1
        out.append(r)
    assert len(out) == len(items)
    assert len(resident_at_dispatch) == len(items)
    # after each dispatch the pipeline holds (prior unconsumed + 1) batches
    assert max(r + 1 for r in resident_at_dispatch) <= depth


def test_stream_over_mesh_matches_plan_batch():
    import jax.numpy as jnp  # noqa: F401

    from tpustomp.engine.distributed import make_mesh

    robot, world = _scene()
    cfg = _cfg()
    items = _problems(B=8, nbatches=3, seed=11)
    mesh = make_mesh()
    got = list(plan_batch_stream(robot, world, iter(items), cfg, depth=2,
                                 gather="serving", mesh=mesh))
    assert len(got) == 3
    for (prob, keys), (traj, succ) in zip(items, got):
        ref = plan_batch(robot, world, prob, cfg, keys=keys)
        np.testing.assert_array_equal(succ, np.asarray(ref.success))
        np.testing.assert_allclose(traj, np.asarray(ref.trajectory),
                                   atol=2e-6)


def test_retry_with_per_row_goal_tolerance():
    """Per-row [B, d] tolerance bands must follow their problems into the
    padded retry batch (regression: the first cut passed the full-B array
    through, breaking the sub-problem shapes)."""
    robot, world = _scene()
    cfg = _cfg(max_iterations=4, max_iterations_after_collision_free=2,
               noise=NoiseConfig(stddev=0.12, decay=0.995,
                                 num_rollouts_reused=2))
    B = 24
    rng = np.random.default_rng(5)
    q0 = (np.tile([-0.56, 1.65], (B, 1))
          + rng.uniform(-0.08, 0.08, (B, 2))).astype(np.float32)
    qN = (np.tile([1.16, -1.46], (B, 1))
          + rng.uniform(-0.08, 0.08, (B, 2))).astype(np.float32)
    tol = np.full((B, 2), 0.02, np.float32)
    prob = ProblemSpec(q0=q0, qN=qN, goal_tolerance_below=tol,
                       goal_tolerance_above=tol)
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    base = plan_batch(robot, world, prob, cfg, keys=keys)
    sol = plan_batch_retry(robot, world, prob, cfg, keys=keys,
                           max_rounds=1, retry_restarts=4)
    succ = np.asarray(sol.success)
    assert succ.sum() >= np.asarray(base.success).sum()
    assert sol.trajectory.shape == base.trajectory.shape


def test_retry_recovers_failed_rows_and_keeps_successful_ones():
    robot, world = _scene()
    # tight budget + low noise: some seeds fail the first pass
    cfg = _cfg(max_iterations=4, max_iterations_after_collision_free=2,
               noise=NoiseConfig(stddev=0.12, decay=0.995,
                                 num_rollouts_reused=2))
    B = 24
    rng = np.random.default_rng(5)
    q0 = (np.tile([-0.56, 1.65], (B, 1))
          + rng.uniform(-0.08, 0.08, (B, 2))).astype(np.float32)
    qN = (np.tile([1.16, -1.46], (B, 1))
          + rng.uniform(-0.08, 0.08, (B, 2))).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    prob = ProblemSpec(q0=q0, qN=qN)

    base = plan_batch(robot, world, prob, cfg, keys=keys)
    base_succ = np.asarray(base.success)
    assert not base_succ.all(), "fixture must produce some failures"

    sol = plan_batch_retry(robot, world, prob, cfg, keys=keys,
                           max_rounds=2, retry_restarts=4)
    succ = np.asarray(sol.success)
    # never loses a success; strictly recovers at least one row here
    assert (succ | ~base_succ).all()
    assert succ.sum() > base_succ.sum()
    # successful first-pass rows are untouched (exact)
    ok = np.flatnonzero(base_succ)
    np.testing.assert_array_equal(np.asarray(sol.trajectory)[ok],
                                  np.asarray(base.trajectory)[ok])
    np.testing.assert_array_equal(np.asarray(sol.iterations)[ok],
                                  np.asarray(base.iterations)[ok])


def test_stream_depth_zero_is_synchronous():
    """depth=0 is a valid fully-synchronous mode: dispatch, then drain to
    empty before the next dispatch. The round-5 drain-before-dispatch
    reorder must not pop an empty deque (IndexError regression)."""
    robot, world = _scene()
    cfg = _cfg()
    items = _problems(4, 3)
    got = list(plan_batch_stream(robot, world, iter(items), cfg, depth=0,
                                 gather="full"))
    assert len(got) == 3
    for (prob, keys), sol in zip(items, got):
        ref = plan_batch(robot, world, prob, cfg, keys=keys)
        np.testing.assert_array_equal(np.asarray(sol.trajectory),
                                      np.asarray(ref.trajectory))
