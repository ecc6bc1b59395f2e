"""Occupancy → analytic-box decomposition (world/decompose.py).

The decomposition must cover the occupied set exactly, and its box-union
SDF must match the signed-EDT voxel-center convention outside the solid to
within one voxel (module docstring accuracy contract).
"""

import numpy as np
import pytest

from tpustomp.world import edt
from tpustomp.world.decompose import analytic_from_occupancy, \
    boxes_from_occupancy
from tpustomp.world.sdf import AnalyticWorld


def _rebuild(occ_shape, boxes):
    out = np.zeros(occ_shape, bool)
    for (x0, y0, z0), (x1, y1, z1) in boxes:
        assert not out[x0:x1 + 1, y0:y1 + 1, z0:z1 + 1].any(), \
            "boxes must be disjoint"
        out[x0:x1 + 1, y0:y1 + 1, z0:z1 + 1] = True
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cover_is_exact_and_disjoint(seed):
    rng = np.random.default_rng(seed)
    occ = rng.random((9, 7, 8)) < 0.3
    boxes = boxes_from_occupancy(occ)
    np.testing.assert_array_equal(_rebuild(occ.shape, boxes), occ)


def test_solid_cuboid_is_one_box():
    occ = np.zeros((10, 10, 10), bool)
    occ[2:7, 3:9, 1:5] = True
    boxes = boxes_from_occupancy(occ)
    assert boxes == [((2, 3, 1), (6, 8, 4))]


def test_tabletop_scene_decomposes_to_two_boxes():
    world = AnalyticWorld.make(
        boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25)),
               ((0.68, -0.05, 0.62), (0.06, 0.06, 0.18))])
    occ = edt.occupancy_from_analytic(world, (-0.2, -1.0, 0.0),
                                      (64, 80, 48), 0.025)
    assert len(boxes_from_occupancy(occ)) == 2


def test_outside_sdf_matches_center_distance_within_a_voxel():
    """Outside the solid, the box-union SDF must bracket the distance to
    the nearest occupied voxel CENTER: d_centers - res <= d_box <=
    d_centers (hull-of-centers convention)."""
    from tpustomp.world.sdf import sdf
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    res = 0.1
    origin = np.zeros(3)
    occ = rng.random((8, 8, 8)) < 0.2
    occ[0, 0, 0] = True  # non-empty
    world = analytic_from_occupancy(occ, res, origin)
    centers = origin + res * np.argwhere(occ)

    pts = rng.uniform(-0.5, 1.3, (200, 3))
    d_centers = np.linalg.norm(pts[:, None, :] - centers[None], axis=-1
                               ).min(axis=1)
    d_box = np.asarray(sdf(world, jnp.asarray(pts, jnp.float32)))
    outside = d_box > 0
    assert outside.sum() > 50
    assert np.all(d_box[outside] <= d_centers[outside] + 1e-5)
    assert np.all(d_box[outside] >= d_centers[outside] - res)


def test_max_boxes_guard_raises():
    rng = np.random.default_rng(0)
    occ = rng.random((6, 6, 6)) < 0.5
    with pytest.raises(ValueError, match="max_boxes"):
        analytic_from_occupancy(occ, 0.1, (0, 0, 0), max_boxes=1)


def test_inflate_grows_every_half_extent():
    occ = np.zeros((4, 4, 4), bool)
    occ[1:3, 1:3, 1:3] = True
    a = analytic_from_occupancy(occ, 0.1, (0, 0, 0))
    b = analytic_from_occupancy(occ, 0.1, (0, 0, 0), inflate=0.05)
    np.testing.assert_allclose(np.asarray(b.box_half),
                               np.asarray(a.box_half) + 0.05, atol=1e-7)


def test_decomposed_world_plans_like_the_grid_world():
    """config-2-style planning on the decomposed world reaches the same
    outcome as the voxel-grid world (same scene, two representations)."""
    import jax

    from tpustomp.api.config import CostWeights, NoiseConfig, PlannerConfig
    from tpustomp.api.plan import plan
    from tpustomp.api.problem import ProblemSpec
    from tpustomp.robot import model

    robot = model.planar_2r(body_radius=0.05)
    analytic = AnalyticWorld.make(spheres=[((1.88, 0.42, 0.0), 0.27)])
    origin, shape, res = (-2.5, -2.5, -0.1), (50, 50, 3), 0.1
    occ = edt.occupancy_from_analytic(analytic, origin, shape, res)
    grid = edt.signed_edt(occ, res, origin)
    boxes = analytic_from_occupancy(occ, res, origin)

    cfg = PlannerConfig(
        num_timesteps=16, duration=1.7, num_rollouts=8,
        noise=NoiseConfig(stddev=0.25, decay=0.995, num_rollouts_reused=2),
        weights=CostWeights(obstacle=1.0, smoothness=0.1),
        collision_clearance=0.1, max_iterations=20,
        max_iterations_after_collision_free=4, record_metrics=False)
    prob = ProblemSpec(q0=np.array([-0.56, 1.65], np.float32),
                       qN=np.array([1.16, -1.46], np.float32))
    a = plan(robot, grid, prob, cfg, key=jax.random.PRNGKey(0))
    b = plan(robot, boxes, prob, cfg, key=jax.random.PRNGKey(0))
    assert bool(a.success) and bool(b.success)
    # same scene, different SDF representation: costs agree loosely
    np.testing.assert_allclose(float(a.cost), float(b.cost), rtol=0.5)
