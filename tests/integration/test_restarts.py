"""num_restarts: parallel-restart selection (solver.solve_best_of).

Reference analogue: re-calling the GetMotionPlan service with a fresh seed
after a failed plan (the 2011-era recourse); here restarts are a vmapped
axis on-chip (SURVEY §3.3 — scenario/rollout parallelism is the primary
axis, restarts ride the same machinery).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.api.config import PlannerConfig, NoiseConfig, CostWeights
from tpustomp.api.plan import plan, plan_batch
from tpustomp.api.problem import ProblemSpec
from tpustomp.dynamics.device import device_ops
from tpustomp.engine import solver
from tpustomp.robot import model
from tpustomp.world.sdf import AnalyticWorld

SPHERE_C = (1.88, 0.42, 0.0)
SPHERE_R = 0.27
Q0 = np.array([-0.56, 1.65], np.float32)
QN = np.array([1.16, -1.46], np.float32)


def _cfg(**kw):
    base = dict(
        num_timesteps=20, duration=2.1, num_rollouts=10,
        noise=NoiseConfig(stddev=0.25, decay=0.995, num_rollouts_reused=0),
        weights=CostWeights(obstacle=1.0, smoothness=0.1, constraint=1.0),
        collision_clearance=0.1, max_iterations=60,
        max_iterations_after_collision_free=5,
    )
    base.update(kw)
    return PlannerConfig(**base)


def test_best_of_matches_manual_loop():
    """plan(num_restarts=R) == the (success, cost)-lexicographic best of R
    independent single-restart solves under the same key split."""
    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[(SPHERE_C, SPHERE_R)])
    prob = ProblemSpec(q0=Q0, qN=QN)
    R = 4
    key = jax.random.PRNGKey(7)

    cfg = _cfg(num_restarts=R)
    sol = plan(robot, world, prob, cfg, key=key)

    cfg1 = _cfg(num_restarts=1)
    manual = [plan(robot, world, prob, cfg1, key=k)
              for k in jax.random.split(key, R)]
    scores = [(not bool(s.success), float(s.cost)) for s in manual]
    best = manual[int(np.argmin([1e20 * a + b for a, b in scores]))]

    assert bool(sol.success) == bool(best.success)
    np.testing.assert_allclose(np.asarray(sol.trajectory),
                               np.asarray(best.trajectory), atol=1e-6)
    np.testing.assert_allclose(float(sol.cost), float(best.cost), rtol=1e-6)


def test_select_best_prefers_success_over_cost():
    traj = jnp.zeros((3, 5, 2))
    sols = solver.__dict__["select_best"]  # explicit: exercising the helper
    from tpustomp.api.problem import Solution

    batch = Solution(
        trajectory=traj,
        times=jnp.zeros((3, 5)),
        success=jnp.array([False, True, True]),
        cost=jnp.array([0.1, 9.0, 3.0]),   # cheapest overall is a failure
        iterations=jnp.array([1, 2, 3]),
        metrics=None,
    )
    out = sols(batch)
    assert bool(out.success)
    assert float(out.cost) == 3.0
    assert int(out.iterations) == 3


def test_plan_batch_restarts_shapes_and_success():
    """Batched queries each get their own restart fan-out; output keeps the
    [batch] leading axis only."""
    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[(SPHERE_C, SPHERE_R)])
    B = 3
    prob = ProblemSpec(q0=np.tile(Q0, (B, 1)), qN=np.tile(QN, (B, 1)))
    cfg = _cfg(num_restarts=3)
    sol = plan_batch(robot, world, prob, cfg,
                     keys=jax.random.split(jax.random.PRNGKey(3), B))
    assert sol.trajectory.shape == (B, cfg.num_timesteps + 2, 2)
    assert sol.success.shape == (B,)
    assert bool(jnp.all(sol.success))
