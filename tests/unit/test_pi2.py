"""PI² update property + oracle-parity tests (SURVEY §5.2/§5.3)."""

import numpy as np
import jax.numpy as jnp

import oracle
from tpustomp.api.config import SmoothnessConfig
from tpustomp.dynamics.smoothness import build_operators
from tpustomp.engine import pi2


def test_probabilities_match_oracle():
    rng = np.random.default_rng(0)
    S = rng.uniform(0, 5, (8, 12))
    got = np.asarray(pi2.probabilities(jnp.asarray(S, jnp.float32), 10.0))
    want = oracle.pi2_probabilities(S, 10.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_probabilities_sum_to_one_and_prefer_low_cost():
    rng = np.random.default_rng(1)
    S = rng.uniform(0, 5, (6, 9))
    P = np.asarray(pi2.probabilities(jnp.asarray(S, jnp.float32), 10.0))
    np.testing.assert_allclose(P.sum(0), 1.0, atol=1e-6)
    for t in range(9):
        assert P[np.argmin(S[:, t]), t] == P[:, t].max()


def test_update_matches_oracle():
    N, K, d = 10, 7, 3
    ops = build_operators(N, 0.1, SmoothnessConfig())
    rng = np.random.default_rng(2)
    eps = rng.standard_normal((K, N, d))
    S = rng.uniform(0, 3, (K, N))
    got = np.asarray(pi2.update(jnp.asarray(eps, jnp.float32),
                                jnp.asarray(S, jnp.float32),
                                jnp.asarray(ops.M, jnp.float32), 10.0))
    want = oracle.pi2_update(eps, S, ops.M, 10.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_identical_rollouts_give_uniform_weights():
    """K identical rollouts ⇒ P uniform ⇒ δθ = M·ε (SURVEY §5.3)."""
    N, K, d = 8, 5, 2
    ops = build_operators(N, 0.2, SmoothnessConfig())
    rng = np.random.default_rng(3)
    e = rng.standard_normal((N, d))
    eps = np.repeat(e[None], K, axis=0)
    S = np.ones((K, N)) * 2.5
    got = np.asarray(pi2.update(jnp.asarray(eps, jnp.float32),
                                jnp.asarray(S, jnp.float32),
                                jnp.asarray(ops.M, jnp.float32), 10.0))
    np.testing.assert_allclose(got, ops.M @ e, atol=1e-5)


def test_zero_noise_is_fixed_point():
    N, K, d = 8, 5, 2
    ops = build_operators(N, 0.2, SmoothnessConfig())
    eps = np.zeros((K, N, d))
    S = np.random.default_rng(4).uniform(0, 1, (K, N))
    got = np.asarray(pi2.update(jnp.asarray(eps, jnp.float32),
                                jnp.asarray(S, jnp.float32),
                                jnp.asarray(ops.M, jnp.float32), 10.0))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)
