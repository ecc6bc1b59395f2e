"""URDF-lite loader tests: parse → RobotSpec → FK matches closed form."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from tpustomp.robot.fk import body_positions, fk_frames
from tpustomp.robot.urdf_lite import load_urdf

PLANAR_2R = """
<robot name="planar2r">
  <link name="base"/>
  <link name="link1">
    <inertial>
      <origin xyz="1.0 0 0"/><mass value="1.5"/>
      <inertia ixx="0.0" iyy="0.0" izz="0.0" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="link2">
    <collision>
      <origin xyz="0.5 0 0" rpy="0 1.5707963 0"/>
      <geometry><cylinder radius="0.05" length="1.0"/></geometry>
    </collision>
  </link>
  <joint name="j1" type="continuous">
    <parent link="base"/><child link="link1"/>
    <origin xyz="0 0 0"/><axis xyz="0 0 1"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="link1"/><child link="link2"/>
    <origin xyz="1.0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-2.5" upper="2.5"/>
  </joint>
</robot>
"""

FIXED_CHAIN = """
<robot name="fixed">
  <link name="base"/>
  <link name="mid"/>
  <link name="tool">
    <collision><origin xyz="0 0 0"/>
      <geometry><sphere radius="0.03"/></geometry></collision>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="mid"/>
    <origin xyz="0 0 0.5"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1"/>
  </joint>
  <joint name="jf" type="fixed">
    <parent link="mid"/><child link="tool"/>
    <origin xyz="0.2 0 0" rpy="0 0 1.5707963"/>
  </joint>
</robot>
"""


def test_planar2r_roundtrip():
    robot = load_urdf(PLANAR_2R)
    assert robot.num_joints == 2
    assert not bool(robot.joint_limited[0])  # continuous
    assert bool(robot.joint_limited[1])
    np.testing.assert_allclose(np.asarray(robot.joint_upper)[1], 2.5)
    # masses: link1 point mass at its tip
    np.testing.assert_allclose(float(robot.link_mass[0]), 1.5)
    np.testing.assert_allclose(np.asarray(robot.link_com)[0], [1, 0, 0],
                               atol=1e-6)
    # FK of the last sphere-chain body matches the oracle EE... bodies are
    # cylinder samples along link2; the farthest one sits near x=0.95
    q = np.array([0.3, -0.7])
    x = np.asarray(body_positions(robot, jnp.asarray(q, jnp.float32)))
    p1, p2 = oracle.fk_planar2r(q)
    # all bodies lie on the segment p1 -> p2 (z=0 plane)
    np.testing.assert_allclose(x[:, 2], 0.0, atol=1e-5)
    for b in x:
        t = np.dot(b[:2] - p1, p2 - p1) / np.dot(p2 - p1, p2 - p1)
        assert -0.01 <= t <= 1.01
        np.testing.assert_allclose(b[:2], p1 + t * (p2 - p1), atol=1e-5)


def test_fixed_joint_folding():
    robot = load_urdf(FIXED_CHAIN)
    assert robot.num_joints == 1
    assert robot.num_bodies == 1
    # at q=0 the tool sphere sits at base + (0,0,0.5) + (0.2,0,0)
    x = np.asarray(body_positions(robot, jnp.zeros(1)))
    np.testing.assert_allclose(x[0], [0.2, 0.0, 0.5], atol=1e-6)
    # rotating the pitch joint by 90deg swings the tool down to (0.5+0, 0, 0.5-0.2)
    x = np.asarray(body_positions(robot, jnp.asarray([np.pi / 2], jnp.float32)))
    np.testing.assert_allclose(x[0], [0.0, 0.0, 0.5 - 0.2], atol=1e-5)


def test_ambiguous_root_raises():
    bad = "<robot><link name='a'/><link name='b'/></robot>"
    with pytest.raises(ValueError):
        load_urdf(bad)
