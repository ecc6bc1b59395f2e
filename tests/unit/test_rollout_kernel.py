"""Fused Pallas rollout kernel vs the XLA cost path (interpret mode on CPU;
the compiled kernel is validated on TPU hardware in bench runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpustomp.costs.obstacle as obst
import tpustomp.kernels.rollout_pallas as rp
from tpustomp.robot import model
from tpustomp.world.sdf import AnalyticWorld


@pytest.mark.parametrize("robot_name", ["arm_7dof", "planar_2r"])
def test_kernel_matches_xla_path(robot_name):
    robot = getattr(model, robot_name)()
    world = AnalyticWorld.make(
        boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25))],
        spheres=[((0.3, 0.3, 0.9), 0.1), ((1.2, -0.4, 0.0), 0.3)])
    T = 34
    d = robot.num_joints
    C = rp.TILE_C
    dt, clearance = 0.05, 0.08
    rng = np.random.default_rng(0)
    cand = rng.uniform(-1.2, 1.2, (C, T, d)).astype(np.float32)

    fn = rp.build_rollout_kernel(robot, world, T, dt, clearance,
                                 interpret=True)
    q_obs, margin_row = fn(jnp.asarray(cand))

    for c in range(0, C, max(1, C // 5)):
        q_ref, m_ref = obst.obstacle_cost(robot, world, jnp.asarray(cand[c]),
                                          dt, clearance)
        np.testing.assert_allclose(np.asarray(q_obs[c]), np.asarray(q_ref),
                                   atol=2e-6)
        assert abs(float(jnp.min(margin_row[c])) - float(m_ref)) < 1e-6


def test_kernel_rejects_prismatic():
    import dataclasses
    robot = model.planar_2r()
    robot = dataclasses.replace(robot, joint_type=jnp.asarray([1, 0]))
    world = AnalyticWorld.make(spheres=[((0, 0, 0), 0.1)])
    with pytest.raises(NotImplementedError):
        rp.build_rollout_kernel(robot, world, 10, 0.1, 0.05, interpret=True)
