"""EDT builder tests: native C++ / scipy / brute-force agreement + grid SDF
construction (SURVEY §5.2 "EDT vs brute-force on random small grids")."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from tpustomp.world import edt, native_edt
from tpustomp.world.sdf import AnalyticWorld, sdf


def _random_occ(seed, shape=(7, 6, 5), p=0.15):
    rng = np.random.default_rng(seed)
    return rng.random(shape) < p


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_signed_edt_matches_brute_force_oracle(seed):
    occ = _random_occ(seed)
    if not occ.any():
        occ[3, 3, 2] = True
    res = 0.05
    grid_sdf = edt.signed_edt(occ, res, origin=(0.0, 0.0, 0.0))
    want = oracle.brute_force_edt(occ, res)
    np.testing.assert_allclose(np.asarray(grid_sdf.grid), want, atol=1e-5)


def test_native_edt_builds_and_matches():
    if not native_edt.available():
        pytest.skip("native toolchain unavailable")
    occ = _random_occ(7, shape=(12, 11, 9))
    occ[0, 0, 0] = True
    d_native = np.sqrt(native_edt.edt_sq(occ))
    from scipy.ndimage import distance_transform_edt
    d_scipy = distance_transform_edt(~occ)
    np.testing.assert_allclose(d_native, d_scipy, atol=1e-9)


def test_native_edt_single_seed_plane_and_line():
    if not native_edt.available():
        pytest.skip("native toolchain unavailable")
    # single seed voxel
    occ = np.zeros((9, 9, 9), bool)
    occ[4, 4, 4] = True
    d = np.sqrt(native_edt.edt_sq(occ))
    assert d[4, 4, 4] == 0
    assert abs(d[0, 4, 4] - 4.0) < 1e-9
    assert abs(d[0, 0, 0] - np.sqrt(48)) < 1e-9
    # empty line along z handled (inf rows mid-transform)
    occ2 = np.zeros((4, 4, 4), bool)
    occ2[0, 0, :] = True
    d2 = np.sqrt(native_edt.edt_sq(occ2))
    assert abs(d2[3, 3, 0] - np.sqrt(18)) < 1e-9


def test_grid_from_analytic_matches_direct_sdf():
    world = AnalyticWorld.make(
        spheres=[((0.3, 0.2, 0.25), 0.12)],
        boxes=[((0.0, 0.0, 0.0), (0.1, 0.2, 0.05))])
    g = edt.grid_from_analytic(world, origin=(-0.5, -0.5, -0.3),
                               shape=(20, 20, 12), resolution=0.05)
    # sample at voxel centers: grid value equals analytic SDF exactly
    pts = []
    for idx in [(3, 4, 5), (10, 10, 6), (19, 0, 11)]:
        pts.append(np.array([-0.5, -0.5, -0.3]) + np.array(idx) * 0.05)
    pts = jnp.asarray(np.array(pts), jnp.float32)
    direct = np.asarray(sdf(world, pts))
    via_grid = np.asarray(sdf(g, pts))
    np.testing.assert_allclose(via_grid, direct, atol=1e-5)


def test_signed_edt_of_voxelized_sphere_approximates_analytic():
    """End-to-end: rasterize a sphere, EDT it, compare against the analytic
    distance away from the surface (within ~1.5 voxel error)."""
    world = AnalyticWorld.make(spheres=[((0.5, 0.5, 0.5), 0.2)])
    res = 0.025
    shape = (40, 40, 40)
    occ = edt.occupancy_from_analytic(world, (0.0, 0.0, 0.0), shape, res)
    g = edt.signed_edt(occ, res, (0.0, 0.0, 0.0))
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.1, 0.9, (30, 3)).astype(np.float32)
    d_true = np.linalg.norm(pts - 0.5, axis=1) - 0.2
    d_grid = np.asarray(sdf(g, jnp.asarray(pts)))
    np.testing.assert_allclose(d_grid, d_true, atol=1.5 * res)


def test_voxelize_point_cloud():
    pts = np.array([[0.11, 0.11, 0.11], [0.39, 0.2, 0.0], [9.0, 9.0, 9.0]])
    occ = edt.voxelize(pts, (0.0, 0.0, 0.0), (5, 5, 5), 0.1)
    assert occ[1, 1, 1] and occ[4, 2, 0]
    assert occ.sum() == 2  # out-of-bounds point dropped


def test_incremental_sdf_matches_full_rebuild():
    """IncrementalSDF updates (add box, remove box, add points) must equal a
    from-scratch clamped rebuild exactly — grid, packed table, and samples
    (the PropagationDistanceField incremental-update contract)."""
    from tpustomp.world.edt import IncrementalSDF

    rng = np.random.default_rng(11)
    shape = (22, 18, 15)
    occ0 = rng.random(shape) < 0.04
    occ0[2:5, 3:6, 4:7] = True
    inc = IncrementalSDF(occ0, origin=(0.0, 0.0, 0.0), resolution=0.05,
                         max_distance=0.2)

    def check():
        fresh = IncrementalSDF(inc.occ, origin=(0.0, 0.0, 0.0),
                               resolution=0.05, max_distance=0.2)
        np.testing.assert_array_equal(np.asarray(inc.as_world().grid),
                                      np.asarray(fresh.as_world().grid))
        # packed rows are only read for sample cells [0, dim-2]
        pk_inc = np.asarray(inc.as_world().packed).reshape(*shape, 8)
        pk_new = np.asarray(fresh.as_world().packed).reshape(*shape, 8)
        np.testing.assert_array_equal(pk_inc[:-1, :-1, :-1],
                                      pk_new[:-1, :-1, :-1])

    inc.set_box((10, 8, 6), (14, 12, 10), True)      # new cuboid obstacle
    check()
    inc.set_box((2, 3, 4), (5, 6, 7), False)         # remove the original
    check()
    pts = rng.uniform(0.1, 0.6, (30, 3))
    inc.add_points(pts)                              # collision-map points
    check()
    # no-op updates leave the field untouched
    grid_before = np.asarray(inc.as_world().grid).copy()
    inc.set_box((10, 8, 6), (14, 12, 10), True)
    np.testing.assert_array_equal(np.asarray(inc.as_world().grid),
                                  grid_before)


def test_incremental_sdf_clamps_at_max_distance():
    from tpustomp.world.edt import IncrementalSDF

    occ = np.zeros((30, 8, 8), bool)
    occ[0, 4, 4] = True
    inc = IncrementalSDF(occ, origin=(0.0, 0.0, 0.0), resolution=0.05,
                         max_distance=0.3)
    g = np.asarray(inc.as_world().grid)
    assert g.max() <= 0.3 + 1e-6
    # near-field values are the true EDT
    assert abs(g[1, 4, 4] - 0.05) < 1e-6
    assert abs(g[0, 4, 4] + 0.05) < 1e-6
