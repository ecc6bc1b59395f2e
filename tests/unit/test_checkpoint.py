"""Checkpoint/resume round-trip of solver and MPC state pytrees (SURVEY §6)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.api.config import PlannerConfig, NoiseConfig
from tpustomp.engine import mpc, solver
from tpustomp.robot import model
from tpustomp.utils import checkpoint


def test_solver_state_roundtrip(tmp_path):
    robot = model.planar_2r()
    cfg = PlannerConfig(num_timesteps=10, duration=1.0, max_iterations=20)
    q0 = jnp.asarray([0.1, -0.2])
    qN = jnp.asarray([0.5, 0.4])
    state = solver.init_state(robot, cfg, q0, qN, jax.random.PRNGKey(3))
    state = state.replace(iteration=jnp.int32(7),
                          best_cost=jnp.float32(1.25))
    path = str(tmp_path / "solver_ckpt")
    checkpoint.save(path, state)
    template = solver.init_state(robot, cfg, q0, qN, jax.random.PRNGKey(0))
    restored = checkpoint.restore(path, template)
    assert int(restored.iteration) == 7
    np.testing.assert_allclose(float(restored.best_cost), 1.25)
    np.testing.assert_array_equal(np.asarray(restored.theta),
                                  np.asarray(state.theta))
    np.testing.assert_array_equal(np.asarray(restored.key),
                                  np.asarray(state.key))


def test_mpc_state_roundtrip_and_resume(tmp_path):
    robot = model.planar_2r(body_radius=0.05)
    cfg = PlannerConfig(
        num_timesteps=12, duration=1.2, num_rollouts=4,
        noise=NoiseConfig(stddev=0.2, decay=1.0, num_rollouts_reused=1),
        max_iterations=3, max_iterations_after_collision_free=2,
        record_metrics=False)
    state = mpc.init_mpc(robot, cfg, np.array([-0.5, 1.5], np.float32),
                         np.array([1.0, -1.4], np.float32),
                         np.array([[2.4, -0.6, 0.0]], np.float32),
                         np.array([[-0.1, 0.1, 0.0]], np.float32),
                         jax.random.PRNGKey(0))
    radius = jnp.asarray([0.2], jnp.float32)
    mid = mpc.run_mpc(robot, cfg, state, radius, num_ticks=3, world_dt=0.1)

    path = str(tmp_path / "mpc_ckpt")
    checkpoint.save(path, mid)
    restored = checkpoint.restore(path, mid)
    # resuming from the restored state continues identically
    out_a = mpc.run_mpc(robot, cfg, mid, radius, num_ticks=2, world_dt=0.1)
    out_b = mpc.run_mpc(robot, cfg, restored, radius, num_ticks=2, world_dt=0.1)
    np.testing.assert_array_equal(np.asarray(out_a.q), np.asarray(out_b.q))
    assert int(out_b.steps) == 5
