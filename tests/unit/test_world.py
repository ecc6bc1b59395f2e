"""SDF world tests: analytic composition + trilinear grid sampling."""

import numpy as np
import jax.numpy as jnp

import oracle
from tpustomp.world.sdf import AnalyticWorld, GridSDF, sdf, sdf_grad


def test_analytic_sphere_distance():
    w = AnalyticWorld.make(spheres=[((0.0, 0.0, 0.0), 0.5)])
    p = jnp.array([[2.0, 0.0, 0.0], [0.0, 0.25, 0.0]])
    np.testing.assert_allclose(np.asarray(sdf(w, p)), [1.5, -0.25], atol=1e-6)


def test_analytic_box_distance():
    w = AnalyticWorld.make(boxes=[((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))])
    pts = jnp.array([
        [2.0, 0.0, 0.0],    # outside, face: d=1
        [2.0, 2.0, 0.0],    # outside, edge: d=sqrt(2)
        [0.0, 0.0, 0.5],    # inside: d=-0.5
    ])
    np.testing.assert_allclose(
        np.asarray(sdf(w, pts)), [1.0, np.sqrt(2), -0.5], atol=1e-6)


def test_analytic_min_composition():
    w = AnalyticWorld.make(spheres=[((0, 0, 0), 0.5), ((3, 0, 0), 1.0)])
    p = jnp.array([[2.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(sdf(w, p)), [0.0], atol=1e-6)


def _random_grid(seed=0, shape=(9, 8, 7)):
    rng = np.random.default_rng(seed)
    grid = rng.standard_normal(shape).astype(np.float32)
    return GridSDF(grid=jnp.asarray(grid), origin=jnp.asarray([-0.5, 0.2, 0.1],
                   jnp.float32), resolution=jnp.float32(0.05)), grid


def test_trilinear_matches_oracle():
    w, grid = _random_grid()
    origin = np.array([-0.5, 0.2, 0.1])
    rng = np.random.default_rng(1)
    pts = origin + rng.uniform(0.02, 0.25, (20, 3))
    got = np.asarray(sdf(w, jnp.asarray(pts, jnp.float32)))
    want = [oracle.trilinear(grid, origin, 0.05, p) for p in pts]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_trilinear_exact_at_corners():
    w, grid = _random_grid(2)
    origin = np.array([-0.5, 0.2, 0.1])
    for idx in [(0, 0, 0), (3, 4, 2), (8, 7, 6)]:
        p = origin + np.array(idx) * 0.05
        got = float(sdf(w, jnp.asarray(p, jnp.float32)))
        assert abs(got - grid[idx]) < 1e-5


def test_grid_gradient_matches_finite_difference():
    w, grid = _random_grid(3)
    origin = np.array([-0.5, 0.2, 0.1])
    rng = np.random.default_rng(4)
    pts = jnp.asarray(origin + rng.uniform(0.05, 0.2, (10, 3)), jnp.float32)
    d, g = sdf_grad(w, pts)
    h = 1e-4
    for ax in range(3):
        dp = jnp.zeros(3).at[ax].set(h)
        fd = (np.asarray(sdf(w, pts + dp)) - np.asarray(sdf(w, pts - dp))) / (2 * h)
        np.testing.assert_allclose(np.asarray(g[:, ax]), fd, atol=1e-2)


def test_analytic_gradient_is_unit_outward_for_sphere():
    w = AnalyticWorld.make(spheres=[((0.0, 0.0, 0.0), 0.5)])
    p = jnp.array([[2.0, 0.0, 0.0]])
    d, g = sdf_grad(w, p)
    np.testing.assert_allclose(np.asarray(g[0]), [1, 0, 0], atol=1e-3)


def test_analytic_grad_matches_central_difference():
    """Closed-form union gradient (world/sdf.py:_analytic_sdf_grad) vs
    central differences of the SDF, outside and inside both primitives."""
    w = AnalyticWorld.make(
        spheres=[((0.5, -0.2, 0.3), 0.4), ((-1.0, 0.8, 0.0), 0.25)],
        boxes=[((1.5, 1.0, -0.5), (0.3, 0.2, 0.4))])
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(-2, 2.5, (64, 3)), jnp.float32)
    # add points strictly inside the box and a sphere
    pts = jnp.concatenate([pts, jnp.asarray(
        [[1.5, 1.05, -0.4], [0.5, -0.2, 0.1]], jnp.float32)], axis=0)
    d, g = sdf_grad(w, pts)
    np.testing.assert_allclose(np.asarray(d), np.asarray(sdf(w, pts)),
                               atol=1e-6)
    eps = 1e-3
    for ax in range(3):
        dp = jnp.zeros(3).at[ax].set(eps)
        fd = (sdf(w, pts + dp) - sdf(w, pts - dp)) / (2 * eps)
        # exclude points near primitive-switch/face-switch sets where the
        # true gradient is discontinuous and FD straddles the kink
        mask = np.abs(np.asarray(fd) - np.asarray(g[:, ax])) < 0.05
        assert mask.mean() > 0.9, f"axis {ax}: too many FD mismatches"
        np.testing.assert_allclose(np.asarray(g[:, ax])[mask],
                                   np.asarray(fd)[mask], atol=5e-3)


def test_composite_world_min_composes_grid_and_overlay():
    """CompositeWorld == min(grid, overlay) for sdf and the matching-branch
    gradient for sdf_grad (the incremental-update path for grid scenes)."""
    import jax
    from tpustomp.world.edt import grid_from_analytic
    from tpustomp.world.sdf import CompositeWorld, sdf, sdf_grad

    static = AnalyticWorld.make(boxes=[((0.5, 0.0, 0.0), (0.2, 0.2, 0.2))])
    grid = grid_from_analytic(static, origin=(-1.0, -1.0, -1.0),
                              shape=(40, 40, 40), resolution=0.05)
    comp = CompositeWorld.make(grid, spheres=[((-0.4, 0.1, 0.0), 0.15)])

    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    # 1-2 ULP slack: the composite and standalone paths compile to different
    # XLA fusions of the same math
    d_comp = np.asarray(sdf(comp, p))
    d_grid = np.asarray(sdf(grid, p))
    d_over = np.asarray(sdf(comp.overlay, p))
    np.testing.assert_allclose(d_comp, np.minimum(d_grid, d_over), atol=1e-6)

    d2, g = sdf_grad(comp, p)
    np.testing.assert_allclose(np.asarray(d2), d_comp, atol=1e-6)
    dg, gg = sdf_grad(grid, p)
    da, ga = sdf_grad(comp.overlay, p)
    want = np.where((np.asarray(dg) <= np.asarray(da))[:, None],
                    np.asarray(gg), np.asarray(ga))
    # gradient branch selection is only well-defined away from grid/overlay
    # ties (measure-zero equidistant set)
    clear = np.abs(np.asarray(dg) - np.asarray(da)) > 1e-5
    np.testing.assert_allclose(np.asarray(g)[clear], want[clear], atol=1e-6)

    # jit/pytree-compatible: overlay update retraces nothing
    f = jax.jit(lambda w, q: sdf(w, q))
    moved = comp.replace(overlay=comp.overlay.replace(
        sphere_center=comp.overlay.sphere_center + 0.2))
    assert np.isfinite(np.asarray(f(comp, p))).all()
    assert np.isfinite(np.asarray(f(moved, p))).all()


def test_safe_norm_forward_identical_and_grad_finite_at_zero():
    import jax
    from tpustomp.world.sdf import safe_norm

    x = jnp.asarray([[0.3, -0.4, 1.2], [0.0, 0.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(safe_norm(x)),
                                  np.asarray(jnp.linalg.norm(x, axis=-1)))
    g = jax.grad(lambda v: jnp.sum(safe_norm(v)))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_safe_norm_propagates_nan():
    """NaN inputs must stay NaN (MPC dead-shard detection relies on it)."""
    from tpustomp.world.sdf import safe_norm

    x = jnp.asarray([[np.nan, 1.0, 0.0], [1.0, 2.0, 2.0]])
    out = np.asarray(safe_norm(x))
    assert np.isnan(out[0]) and abs(out[1] - 3.0) < 1e-6


def test_analytic_make_accepts_generators_and_arrays():
    """make() must materialize its iterables ONCE (round-5 fix: a generator
    input was exhausted by the first comprehension, silently producing an
    obstacle-free world), and accept numpy-array inputs."""
    pairs = [((2.0, 0.0, 0.0), 0.25), ((0.0, 1.0, 0.0), 0.1)]
    w_gen = AnalyticWorld.make(spheres=(p for p in pairs))
    assert w_gen.sphere_center.shape == (2, 3)
    assert w_gen.sphere_radius.shape == (2,)
    # inside the first sphere: definitely negative distance
    assert float(sdf(w_gen, jnp.asarray([[2.0, 0.0, 0.0]]))[0]) < 0.0
    w_arr = AnalyticWorld.make(
        spheres=np.array([[[2.0, 0.0, 0.0]], [[0.25, 0.25, 0.25]]],
                         dtype=object)[0:0],  # empty array input: no crash
        boxes=np.asarray([((0.5, 0.0, 0.0), (0.2, 0.2, 0.2))],
                         dtype=np.float32))
    assert w_arr.box_center.shape == (1, 3)


def test_potential_finite_at_zero_clearance():
    """potential/potential_deriv with eps=0 must degrade to the hinge, not
    0/0=NaN at touching distance (round-5 fix)."""
    from tpustomp.costs.obstacle import potential, potential_deriv

    d = jnp.asarray([-0.1, 0.0, 0.1])
    p = np.asarray(potential(d, 0.0))
    g = np.asarray(potential_deriv(d, 0.0))
    assert np.all(np.isfinite(p)) and np.all(np.isfinite(g))
    np.testing.assert_allclose(p, [0.1, 0.0, 0.0])
    np.testing.assert_allclose(g, [-1.0, 0.0, 0.0])
