"""API-entry eager validation guards.

The kernel-side joint_static consistency check only sees concrete leaves,
but production entries run the kernel under jit — so the public API must
validate the robot eagerly before tracing (r4 ADVICE, severity medium).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpustomp.api.config import CostWeights, NoiseConfig, PlannerConfig
from tpustomp.api.plan import plan, plan_batch
from tpustomp.api.problem import ProblemSpec
from tpustomp.robot import model
from tpustomp.world.sdf import AnalyticWorld


def _cfg():
    return PlannerConfig(
        num_timesteps=12, duration=1.5, num_rollouts=6,
        noise=NoiseConfig(stddev=0.2, decay=0.995, num_rollouts_reused=2),
        weights=CostWeights(obstacle=1.0, smoothness=0.1),
        collision_clearance=0.08, max_iterations=8,
        max_iterations_after_collision_free=3, record_metrics=False)


def _stale_robot():
    """arm_7dof with joint_axis mutated but joint_static left stale —
    exactly the dataclasses.replace hazard the guard exists for."""
    robot = model.arm_7dof()
    assert robot.joint_static is not None
    axes = np.asarray(robot.joint_axis).copy()
    axes[1] = [0.0, 0.0, 1.0]  # joint 1 is y-axis: force a disagreement
    assert not np.array_equal(axes, np.asarray(robot.joint_axis))
    return robot, dataclasses.replace(robot, joint_axis=jnp.asarray(axes))


def test_plan_warns_and_drops_stale_joint_static():
    robot, stale = _stale_robot()
    world = AnalyticWorld.make(spheres=[((0.5, 0.2, 0.5), 0.15)])
    q0 = np.zeros(7, np.float32)
    qN = np.full(7, 0.4, np.float32)
    prob = ProblemSpec(q0=q0, qN=qN)
    # the honest robot for comparison: same (mutated) arrays, no stale
    # specialization
    honest = dataclasses.replace(stale, joint_static=None)
    with pytest.warns(UserWarning, match="joint_static"):
        a = plan(stale, world, prob, _cfg(), key=jax.random.PRNGKey(0))
    b = plan(honest, world, prob, _cfg(), key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(a.trajectory),
                                  np.asarray(b.trajectory))
    assert bool(a.success) == bool(b.success)


def test_plan_batch_warns_on_stale_joint_static():
    robot, stale = _stale_robot()
    world = AnalyticWorld.make(spheres=[((0.5, 0.2, 0.5), 0.15)])
    B = 4
    prob = ProblemSpec(q0=np.zeros((B, 7), np.float32),
                       qN=np.full((B, 7), 0.4, np.float32))
    with pytest.warns(UserWarning, match="joint_static"):
        plan_batch(stale, world, prob, _cfg())


def test_consistent_robot_does_not_warn():
    import warnings

    robot = model.arm_7dof()
    world = AnalyticWorld.make(spheres=[((0.5, 0.2, 0.5), 0.15)])
    prob = ProblemSpec(q0=np.zeros(7, np.float32),
                       qN=np.full(7, 0.4, np.float32))
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        plan(robot, world, prob, _cfg(), key=jax.random.PRNGKey(0))


def test_mpc_sharded_warns_on_stale_joint_static():
    """The MPC production entries must run the same eager guard as
    plan/plan_batch: run_mpc_sharded jits its tick, so a stale
    joint_static would silently replan with the OLD kinematics."""
    from tpustomp.engine import mpc as mpc_mod

    robot, stale = _stale_robot()
    B = 8  # must divide the (virtual 8-device) scenario mesh
    cfg = _cfg()
    q0 = np.zeros(7, np.float32)
    qN = np.full(7, 0.3, np.float32)
    centers = np.asarray([[0.6, 0.3, 0.4]], np.float32)
    vel = np.asarray([[-0.1, 0.0, 0.0]], np.float32)
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[mpc_mod.init_mpc(stale, cfg, q0, qN, centers, vel,
                           jax.random.PRNGKey(i)) for i in range(B)])
    with pytest.warns(UserWarning, match="joint_static"):
        mpc_mod.run_mpc_sharded(stale, cfg, states,
                                jnp.asarray([0.1], jnp.float32), 2, 0.1)


def test_mpc_resilient_warns_on_stale_joint_static():
    from tpustomp.engine import mpc as mpc_mod

    robot, stale = _stale_robot()
    B = 8
    cfg = _cfg()
    q0 = np.zeros(7, np.float32)
    qN = np.full(7, 0.3, np.float32)
    centers = np.asarray([[0.6, 0.3, 0.4]], np.float32)
    vel = np.asarray([[-0.1, 0.0, 0.0]], np.float32)
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[mpc_mod.init_mpc(stale, cfg, q0, qN, centers, vel,
                           jax.random.PRNGKey(i)) for i in range(B)])
    with pytest.warns(UserWarning, match="joint_static"):
        mpc_mod.run_mpc_resilient(stale, cfg, states,
                                  jnp.asarray([0.1], jnp.float32), 2, 0.1,
                                  chunk_ticks=2)
