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


# ---------------------------------------------------------------------------
# mesh collision geometry (STL / OBJ → PCA sphere cover)

_BOX_TRIS = [  # 12 triangles of an axis-aligned box [0,0.6]x[0,0.1]x[0,0.1]
    ((0, 0, 0), (sx, sy, sz))
    for sx, sy, sz in [(1, 1, 0)]
]


def _box_vertices(lx=0.6, ly=0.1, lz=0.1):
    return np.array([(x, y, z) for x in (0, lx) for y in (0, ly)
                     for z in (0, lz)], np.float64)


def _box_triangles(lx=0.6, ly=0.1, lz=0.1):
    v = _box_vertices(lx, ly, lz)
    idx = [(0, 1, 2), (1, 3, 2), (4, 6, 5), (5, 6, 7),  # x faces
           (0, 4, 1), (1, 4, 5), (2, 3, 6), (3, 7, 6),  # y faces
           (0, 2, 4), (2, 6, 4), (1, 5, 3), (3, 5, 7)]  # z faces
    return v[np.array(idx)]


def _write_binary_stl(path, tris):
    import struct

    with open(path, "wb") as f:
        f.write(b"\x00" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(np.zeros(3, "<f4").tobytes())
            f.write(np.asarray(t, "<f4").tobytes())
            f.write(struct.pack("<H", 0))


def _write_ascii_stl(path, tris):
    with open(path, "w") as f:
        f.write("solid mesh\n")
        for t in tris:
            f.write(" facet normal 0 0 0\n  outer loop\n")
            for v in t:
                f.write(f"   vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("  endloop\n endfacet\n")
        f.write("endsolid mesh\n")


def _write_obj(path, tris):
    with open(path, "w") as f:
        for t in tris:
            for v in t:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")


def _assert_covers(spheres, pts, slack=1e-6):
    c = np.array([s[0] for s in spheres])
    r = np.array([s[1] for s in spheres])
    d = np.linalg.norm(pts[:, None, :] - c[None], axis=-1)
    assert np.all((d <= r[None] + slack).any(axis=1)), "vertex not covered"


@pytest.mark.parametrize("writer,ext", [(_write_binary_stl, "stl"),
                                        (_write_ascii_stl, "stl"),
                                        (_write_obj, "obj")])
def test_mesh_sphere_cover_formats(tmp_path, writer, ext):
    from tpustomp.robot.urdf_lite import _load_mesh_points, _spheres_from_points

    tris = _box_triangles()
    path = str(tmp_path / f"link.{ext}")
    writer(path, tris)
    pts = _load_mesh_points(path, np.ones(3))
    # all 8 corners present, all samples within the box bounds
    corners = _box_vertices()
    d = np.linalg.norm(pts[None] - corners[:, None], axis=-1)
    assert np.all(d.min(axis=1) < 1e-6)
    assert np.all(pts >= -1e-6) and np.all(pts <= [0.6 + 1e-6, 0.1 + 1e-6,
                                                   0.1 + 1e-6])
    spheres = _spheres_from_points(pts)
    # STL facets are densified -> several spheres along the long axis;
    # OBJ is a bare vertex cloud (8 corners -> 2 occupied slices)
    assert len(spheres) >= (3 if ext == "stl" else 2)
    _assert_covers(spheres, pts)
    assert max(s[1] for s in spheres) < 0.35  # not one giant ball


def test_urdf_mesh_collision_geometry(tmp_path):
    _write_binary_stl(str(tmp_path / "arm.stl"), _box_triangles())
    urdf = """
    <robot name="meshbot">
      <link name="base"/>
      <link name="arm">
        <collision>
          <origin xyz="0 0 0.05" rpy="0 0 0"/>
          <geometry><mesh filename="package://meshbot/arm.stl"
                          scale="1 1 1"/></geometry>
        </collision>
      </link>
      <joint name="j1" type="revolute">
        <parent link="base"/><child link="arm"/>
        <origin xyz="0 0 0"/><axis xyz="0 0 1"/>
        <limit lower="-3" upper="3"/>
      </joint>
    </robot>
    """
    spec = load_urdf(urdf, mesh_dir=str(tmp_path))
    assert spec.num_bodies >= 3
    # all bodies attach to the single moving joint and cover the mesh verts
    pos = np.asarray(body_positions(spec, jnp.zeros(1)))
    _assert_covers(list(zip(pos, np.asarray(spec.body_radius))),
                   _box_vertices() + np.array([0.0, 0.0, 0.05]))


def test_urdf_mesh_missing_file_raises(tmp_path):
    urdf = """
    <robot name="m"><link name="base"/><link name="a">
      <collision><geometry><mesh filename="nope.stl"/></geometry></collision>
    </link>
    <joint name="j" type="revolute"><parent link="base"/><child link="a"/>
      <axis xyz="0 0 1"/><limit lower="-1" upper="1"/></joint></robot>
    """
    with pytest.raises(FileNotFoundError):
        load_urdf(urdf, mesh_dir=str(tmp_path))


INERTIA_MERGE = """
<robot name="merge">
  <link name="base"/>
  <link name="a">
    <inertial>
      <origin xyz="0 0 0"/><mass value="1.0"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="b">
    <inertial>
      <origin xyz="0 0 0"/><mass value="1.0"/>
      <inertia ixx="0.002" iyy="0.002" izz="0.002" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="a"/>
    <origin xyz="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-2" upper="2"/>
  </joint>
  <joint name="jf" type="fixed">
    <parent link="a"/><child link="b"/>
    <origin xyz="0.3 0 0"/>
  </joint>
</robot>
"""


def test_fixed_link_inertia_merge_uses_parallel_axis():
    """Folding a fixed child's inertial into its carrier must transport
    BOTH tensors to the merged com (round-5 fix: the rotated child tensor
    alone underestimated a 2x1 kg, 0.3 m pair by 16x, silently distorting
    RNE torque costs on URDF arms with merged links)."""
    robot = load_urdf(INERTIA_MERGE)
    np.testing.assert_allclose(float(robot.link_mass[0]), 2.0)
    np.testing.assert_allclose(np.asarray(robot.link_com[0]),
                               [0.15, 0.0, 0.0], atol=1e-7)
    # point-mass transport about z: each 1 kg at 0.15 m -> 2*1*0.15^2
    # = 0.045, plus the own-tensors 0.001+0.002
    I = np.asarray(robot.link_inertia[0])
    np.testing.assert_allclose(I[2, 2], 0.045 + 0.003, rtol=1e-6)
    # about x: the offset is along x, so no transport — own tensors only
    np.testing.assert_allclose(I[0, 0], 0.003, rtol=1e-6)
    # about y: same transport as z for an x-offset
    np.testing.assert_allclose(I[1, 1], 0.045 + 0.003, rtol=1e-6)
    assert np.allclose(I, I.T)
