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
    C = 24  # deliberately not a tile multiple: exercises padding
    dt, clearance = 0.05, 0.08
    rng = np.random.default_rng(0)
    cand = rng.uniform(-1.2, 1.2, (C, T, d)).astype(np.float32)

    q_obs, margin = rp.obstacle_cost_batch_pallas(
        robot, world, jnp.asarray(cand), dt, clearance, interpret=True)

    for c in range(0, C, max(1, C // 5)):
        q_ref, m_ref = obst.obstacle_cost(robot, world, jnp.asarray(cand[c]),
                                          dt, clearance)
        np.testing.assert_allclose(np.asarray(q_obs[c]), np.asarray(q_ref),
                                   atol=2e-6)
        assert abs(float(margin[c]) - float(m_ref)) < 1e-6


def test_supports_flags():
    import dataclasses
    robot = model.planar_2r()
    world = AnalyticWorld.make(spheres=[((0, 0, 0), 0.1)])
    assert rp.supports(robot, world)
    prism = dataclasses.replace(robot, joint_type=jnp.asarray([1, 0]))
    assert not rp.supports(prism, world)
    from tpustomp.world import edt
    grid = edt.signed_edt(np.ones((4, 4, 4), bool), 0.1, (0, 0, 0))
    assert not rp.supports(robot, grid)
