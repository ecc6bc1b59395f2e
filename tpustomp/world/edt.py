"""Grid SDF builders: analytic primitives → grid, occupancy → signed EDT.

Reference equivalent (SURVEY §3.2): the ``distance_field`` package's
``PropagationDistanceField`` — a voxel grid incrementally propagating
Euclidean distances from obstacle cells, fed by collision-map ROS topics.

TPU-first split: all construction is *offline host work* (the reference also
rebuilds its field outside the optimizer hot loop); the device only ever sees
the finished [X,Y,Z] float32 grid (world/sdf.py). Builders:

  - `grid_from_analytic`: exact SDF of sphere/box unions evaluated at voxel
    centers (vectorized). Used for static scenes with known primitives and to
    cross-check the EDT path.
  - `signed_edt`: exact signed Euclidean distance transform of a boolean
    occupancy grid via the Felzenszwalb-Huttenlocher separable lower-envelope
    algorithm, three 1-D passes (the same O(n) scheme scipy uses). A native
    C++ implementation (native/edt.cpp, ctypes) is used when built — the
    pure-NumPy fallback is exact but slower; both match the brute-force
    oracle on random grids (tests/unit/test_edt.py).
  - `occupancy_from_analytic` + `voxelize`: helpers to rasterize primitives
    or point clouds into occupancy (the collision-map ingestion path).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpustomp.world.sdf import AnalyticWorld, GridSDF
from tpustomp.world import native_edt


def _voxel_centers(origin, shape, resolution):
    ax = [origin[i] + resolution * np.arange(shape[i]) for i in range(3)]
    gx, gy, gz = np.meshgrid(*ax, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1)  # [X,Y,Z,3]


def _analytic_sdf_np(world: AnalyticWorld, pts: np.ndarray) -> np.ndarray:
    """NumPy twin of world/sdf._analytic_sdf for offline grid construction."""
    d = np.full(pts.shape[:-1], 1e6, np.float64)
    sc = np.asarray(world.sphere_center)
    sr = np.asarray(world.sphere_radius)
    if sr.shape[0]:
        rel = pts[..., None, :] - sc
        ds = np.linalg.norm(rel, axis=-1) - sr
        d = np.minimum(d, ds.min(axis=-1))
    bc = np.asarray(world.box_center)
    bh = np.asarray(world.box_half)
    if bh.shape[0]:
        q = np.abs(pts[..., None, :] - bc) - bh
        outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
        inside = np.minimum(q.max(axis=-1), 0.0)
        d = np.minimum(d, (outside + inside).min(axis=-1))
    return d


def grid_from_analytic(world: AnalyticWorld, origin, shape,
                       resolution: float) -> GridSDF:
    """Exact SDF grid of a primitive world (voxel centers sampled)."""
    pts = _voxel_centers(np.asarray(origin, np.float64), shape, resolution)
    grid = _analytic_sdf_np(world, pts).astype(np.float32)
    return GridSDF.make(grid, origin, resolution)


def occupancy_from_analytic(world: AnalyticWorld, origin, shape,
                            resolution: float) -> np.ndarray:
    """Boolean occupancy grid: voxel center inside any primitive."""
    pts = _voxel_centers(np.asarray(origin, np.float64), shape, resolution)
    return _analytic_sdf_np(world, pts) <= 0.0


def voxelize(points: np.ndarray, origin, shape, resolution: float) -> np.ndarray:
    """Rasterize a point cloud [P,3] into occupancy (collision-map ingestion,
    reference: StompCollisionSpace collision-map topic callbacks)."""
    occ = np.zeros(shape, bool)
    idx = np.floor((points - np.asarray(origin)) / resolution + 0.5).astype(int)
    ok = np.all((idx >= 0) & (idx < np.asarray(shape)), axis=1)
    idx = idx[ok]
    occ[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    return occ


# ------------------------------------------------------------------ EDT
def _edt_brute(seed: np.ndarray) -> np.ndarray:
    """Brute-force exact EDT (tiny grids only; last-resort fallback)."""
    pts = np.argwhere(seed)
    idx = np.indices(seed.shape).reshape(3, -1).T
    d = np.sqrt(((idx[:, None, :] - pts[None, :, :]) ** 2).sum(-1)).min(1)
    return d.reshape(seed.shape)


def edt_voxels(seed: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance (in voxel units) to the nearest seed voxel.

    Uses the native C++ kernel when built, else scipy, else brute force.
    """
    if not seed.any():
        return np.full(seed.shape, np.inf)
    if native_edt.available():
        return np.sqrt(native_edt.edt_sq(seed))
    try:
        from scipy.ndimage import distance_transform_edt
        return distance_transform_edt(~seed)
    except ImportError:  # pragma: no cover
        return _edt_brute(seed)


def signed_edt(occ: np.ndarray, resolution: float, origin) -> GridSDF:
    """Signed EDT grid: positive outside (distance to nearest occupied voxel),
    negative inside (−distance to nearest free voxel); matches the oracle's
    brute_force_edt convention."""
    occ = np.asarray(occ, bool)
    d_out = edt_voxels(occ)
    d_in = edt_voxels(~occ)
    signed = np.where(occ, -d_in, d_out) * resolution
    signed = np.where(np.isfinite(signed), signed,
                      np.sign(signed) * 1e6).astype(np.float32)
    return GridSDF.make(signed, origin, resolution)
