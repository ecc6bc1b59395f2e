"""Joint-limit projection tests (SURVEY A.7)."""

import numpy as np
import jax.numpy as jnp

import oracle
from tpustomp.api.config import SmoothnessConfig
from tpustomp.dynamics.smoothness import build_operators
from tpustomp.engine.limits import (project_limits, project_limits_jacobi,
                                    project_limits_sequential)


def _setup(N=12, d=2):
    ops = build_operators(N, 0.1, SmoothnessConfig())
    rng = np.random.default_rng(0)
    theta = rng.uniform(-2.0, 2.0, (N, d))
    lo = np.full(d, -1.0)
    hi = np.full(d, 1.0)
    return ops, theta, lo, hi


def test_projection_feasible():
    ops, theta, lo, hi = _setup()
    out = np.asarray(project_limits(
        jnp.asarray(theta, jnp.float32), jnp.asarray(lo, jnp.float32),
        jnp.asarray(hi, jnp.float32), jnp.ones(2, bool),
        jnp.asarray(ops.Rinv, jnp.float32), 10))
    assert np.all(out <= hi + 1e-5) and np.all(out >= lo[None] - 1e-5)


def test_projection_noop_when_feasible():
    ops, theta, lo, hi = _setup()
    theta = np.clip(theta, -0.9, 0.9)
    out = np.asarray(project_limits(
        jnp.asarray(theta, jnp.float32), jnp.asarray(lo, jnp.float32),
        jnp.asarray(hi, jnp.float32), jnp.ones(2, bool),
        jnp.asarray(ops.Rinv, jnp.float32), 10))
    np.testing.assert_allclose(out, theta, atol=1e-5)


def test_unlimited_joints_untouched():
    ops, theta, lo, hi = _setup()
    limited = jnp.asarray([True, False])
    out = np.asarray(project_limits(
        jnp.asarray(theta, jnp.float32), jnp.asarray(lo, jnp.float32),
        jnp.asarray(hi, jnp.float32), limited,
        jnp.asarray(ops.Rinv, jnp.float32), 10))
    np.testing.assert_allclose(out[:, 1], theta[:, 1], atol=1e-6)
    assert np.all(out[:, 0] <= 1 + 1e-5)


def test_sequential_projection_matches_oracle():
    """The pre-clamp smoothing pushes violations through R^-1 columns exactly
    as the oracle's reference-style loop does."""
    ops, theta, lo, hi = _setup()
    want = oracle.joint_limit_projection(theta, lo, hi, ops.Rinv, iters=10)
    got = np.asarray(project_limits_sequential(
        jnp.asarray(theta, jnp.float32), jnp.asarray(lo, jnp.float32),
        jnp.asarray(hi, jnp.float32), jnp.ones(2, bool),
        jnp.asarray(ops.Rinv, jnp.float32), 10))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_jacobi_projection_feasible_and_comparably_smooth():
    """The fast simultaneous projection must be feasible and not much rougher
    than the reference-style sequential one."""
    ops, theta, lo, hi = _setup()
    args = (jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
            jnp.ones(2, bool), jnp.asarray(ops.Rinv, jnp.float32), 10)
    jac = np.asarray(project_limits_jacobi(jnp.asarray(theta, jnp.float32), *args))
    seq = np.asarray(project_limits_sequential(jnp.asarray(theta, jnp.float32), *args))
    assert np.all(jac <= hi + 1e-5) and np.all(jac >= lo - 1e-5)
    acc = lambda x: float((np.diff(x, 2, axis=0) ** 2).sum())
    assert acc(jac) < 1.5 * acc(seq) + 1e-6


def test_jacobi_single_violation_matches_sequential():
    """For one isolated violation the trust-region Jacobi step IS the
    reference correction (same column, same magnitude)."""
    ops, theta, lo, hi = _setup()
    theta = np.clip(theta, -0.9, 0.9)
    theta[5, 0] = 1.4  # one violation
    args = (jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
            jnp.ones(2, bool), jnp.asarray(ops.Rinv, jnp.float32), 10)
    jac = np.asarray(project_limits_jacobi(jnp.asarray(theta, jnp.float32), *args))
    seq = np.asarray(project_limits_sequential(jnp.asarray(theta, jnp.float32), *args))
    np.testing.assert_allclose(jac, seq, atol=5e-3)
