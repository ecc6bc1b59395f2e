"""Unit tests for dynamics/smoothness.py against the NumPy oracle (SURVEY §5.2)."""

import numpy as np
import pytest

import oracle
from tpustomp.api.config import SmoothnessConfig
from tpustomp.dynamics.smoothness import build_operators, smoothness_cost


@pytest.mark.parametrize("stencil", ["fd3", "fd5", "fd7"])
@pytest.mark.parametrize("weights", [(0.0, 1.0, 0.0), (1.0, 1.0, 0.1)])
def test_R_matches_oracle_quadratic_form(stencil, weights):
    N, dt = 12, 0.1
    cfg = SmoothnessConfig(weight_velocity=weights[0],
                           weight_acceleration=weights[1],
                           weight_jerk=weights[2], stencil=stencil)
    ops = build_operators(N, dt, cfg)
    R_oracle = oracle.build_R(N, dt, weights, stencil)
    np.testing.assert_allclose(ops.R, R_oracle, rtol=1e-9, atol=1e-9)


def test_R_symmetric_psd():
    ops = build_operators(20, 0.25, SmoothnessConfig())
    np.testing.assert_allclose(ops.R, ops.R.T, atol=1e-12)
    eig = np.linalg.eigvalsh(ops.R)
    assert eig.min() > 0, f"R not PD: min eig {eig.min()}"


def test_chol_roundtrip():
    ops = build_operators(15, 0.2, SmoothnessConfig())
    cov = ops.L_sample @ ops.L_sample.T
    np.testing.assert_allclose(cov * ops.cov_scale, ops.Rinv, rtol=1e-8, atol=1e-10)


def test_M_column_max():
    N = 17
    ops = build_operators(N, 0.3, SmoothnessConfig())
    col_max = np.abs(ops.M).max(axis=0)
    np.testing.assert_allclose(col_max, 1.0 / N, rtol=1e-12)
    M_oracle = oracle.M_matrix(ops.R)
    np.testing.assert_allclose(ops.M, M_oracle, rtol=1e-8, atol=1e-12)


def test_sampled_noise_covariance_statistics():
    """ε = L z has empirical covariance ≈ R^-1 / max|R^-1| (fixed seed)."""
    N = 10
    ops = build_operators(N, 0.5, SmoothnessConfig())
    rng = np.random.default_rng(0)
    z = rng.standard_normal((200_000, N))
    eps = z @ ops.L_sample.T
    emp = eps.T @ eps / len(eps)
    np.testing.assert_allclose(emp, ops.Rinv / ops.cov_scale, atol=0.02)


def test_smoothness_cost_matches_oracle():
    N, d, dt = 9, 3, 0.15
    rng = np.random.default_rng(1)
    theta = rng.standard_normal((N, d))
    q0, qN = rng.standard_normal(d), rng.standard_normal(d)
    cfg = SmoothnessConfig(weight_velocity=0.5, weight_acceleration=1.0)
    ops = build_operators(N, dt, cfg)
    got = smoothness_cost(ops, theta, q0, qN)
    want = oracle.smoothness_cost(theta, q0, qN, dt, (0.5, 1.0, 0.0))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_smoothness_minimizer_properties():
    """The unconstrained minimizer θ* = -R^-1 R_bias q of the acceleration
    cost with endpoint-duplicated padding (which imposes zero-velocity
    boundary conditions, as in the reference) is symmetric, monotone, inside
    the endpoint interval, and cheaper than both linear and min-jerk inits."""
    N, dt = 25, 0.1
    ops = build_operators(N, dt, SmoothnessConfig())
    q0, qN = np.array([0.0]), np.array([2.0])
    q = np.stack([q0, qN])
    theta_star = np.linalg.solve(ops.R, -ops.R_bias @ q)
    th = theta_star[:, 0]
    # point symmetry about the midpoint
    np.testing.assert_allclose(th + th[::-1], q0[0] + qN[0], atol=1e-8)
    assert np.all(np.diff(th) > 0)
    assert th.min() >= 0 and th.max() <= 2
    c_star = smoothness_cost(ops, theta_star, q0, qN)
    lin = q0 + (qN - q0) * (np.arange(1, N + 1) / (N + 1))[:, None]
    mj = oracle.min_jerk(q0, qN, N, dt * (N + 1))
    assert c_star <= smoothness_cost(ops, lin, q0, qN) + 1e-12
    assert c_star <= smoothness_cost(ops, mj, q0, qN) + 1e-12


def test_potential_values_and_continuity():
    eps = 0.1
    # piecewise values
    assert oracle.potential(-0.2, eps) == pytest.approx(0.2 + 0.05)
    assert oracle.potential(0.05, eps) == pytest.approx(0.05**2 / (2 * eps))
    assert oracle.potential(0.5, eps) == 0.0
    # C^1 at d=0 and d=eps (finite-difference slope continuity)
    h = 1e-7
    for x in (0.0, eps):
        left = (oracle.potential(x, eps) - oracle.potential(x - h, eps)) / h
        right = (oracle.potential(x + h, eps) - oracle.potential(x, eps)) / h
        assert abs(left - right) < 1e-5


def test_min_jerk_boundary_conditions():
    N, T = 50, 5.0
    q0, qN = np.array([0.0, -1.0]), np.array([1.0, 2.0])
    theta = oracle.min_jerk(q0, qN, N, T)
    dt = T / (N + 1)
    for j in range(2):
        vel = oracle.derivative(theta[:, j], q0[j], qN[j], 1, dt)
        acc = oracle.derivative(theta[:, j], q0[j], qN[j], 2, dt)
        # near-zero velocity at the ends; acceleration small one step in
        # relative to the mid-trajectory peak |acc| ≈ 5.77·Δq/T²
        assert abs(vel[0]) < 1e-2 and abs(vel[-1]) < 1e-2
        peak = np.abs(acc).max()
        assert abs(acc[1]) < 0.25 * peak and abs(acc[-2]) < 0.25 * peak
    # monotone interpolation between endpoints
    assert np.all(theta[:, 0] >= 0) and np.all(theta[:, 0] <= 1)


def test_fd7_stencils_exact_on_polynomials():
    """The 7-point family (reference DIFF_RULE_LENGTH=7 shape) must be exact
    for vel/acc on degree-5 and jerk on degree-4 polynomials."""
    from tpustomp.dynamics.smoothness import _STENCILS

    h = 0.1
    x = np.arange(-3, 4) * h
    f = 3 * x**5 - 2 * x**4 + x**3 - x**2 + 5 * x + 1
    truth = {1: 5.0, 2: -2.0, 3: 6.0}  # derivatives at 0
    for order in (1, 2, 3):
        coeffs, r = _STENCILS["fd7"][order]
        assert r == 3 and len(coeffs) == 7
        got = float(np.dot(coeffs, f)) / h**order
        np.testing.assert_allclose(got, truth[order], rtol=1e-9, atol=1e-9)
