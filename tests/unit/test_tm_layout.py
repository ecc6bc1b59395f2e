"""Time-major layout equivalences (engine/solver.make_step_batch_tm).

The batched solver's time-major path rebuilds sampling, control cost, and
the PI² update in the fused kernel's lane-major layout; each piece must
agree with its scenario-major original (same contractions, relabeled axes).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.costs.smoothness import (smoothness_cost_per_timestep_batch,
                                       smoothness_cost_per_timestep_tm)
from tpustomp.dynamics.device import device_ops
from tpustomp.engine import pi2
from tpustomp.engine.sampling import sample_noise, sample_noise_tm
from tpustomp.api.config import SmoothnessConfig


def _ops(N=24, dt=0.05):
    return device_ops(N, dt, SmoothnessConfig())


def test_sample_noise_tm_matches_vmap():
    ops = _ops()
    B, K, d = 5, 7, 3
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    sigma_bd = jnp.asarray(
        np.random.default_rng(1).uniform(0.05, 0.2, (B, d)), jnp.float32)
    ref = jax.vmap(lambda k, s: sample_noise(k, ops.L_sample, s, K)
                   )(keys, sigma_bd)                     # [B, K, N, d]
    tm = sample_noise_tm(keys, ops.L_sample, sigma_bd, K)  # [N, d, B, K]
    # same z values, same contraction axis; differently-shaped dots may
    # reassociate the m-reduction (measured 9e-8 on CPU), so ULP tolerance
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(tm, (2, 3, 0, 1))), np.asarray(ref),
        rtol=1e-6, atol=1e-6)


def test_update_tm_matches_vmap_update():
    ops = _ops()
    B, K, d, N = 4, 6, 3, 24
    rng = np.random.default_rng(2)
    eps = jnp.asarray(rng.standard_normal((B, K, N, d)), jnp.float32)
    S = jnp.asarray(rng.uniform(0, 5, (B, K, N)), jnp.float32)
    ref = jax.vmap(lambda e, s: pi2.update(e, s, ops.M, 10.0))(eps, S)
    tm = pi2.update_tm(jnp.transpose(eps, (2, 3, 0, 1)), S, ops.M, 10.0)
    np.testing.assert_allclose(np.asarray(tm), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_smoothness_tm_matches_batch():
    ops = _ops()
    B, C, d, N = 3, 5, 2, 24
    rng = np.random.default_rng(3)
    cand = jnp.asarray(rng.uniform(-1, 1, (B, C, N, d)), jnp.float32)
    q0 = jnp.asarray(rng.uniform(-1, 1, (B, d)), jnp.float32)
    qN = jnp.asarray(rng.uniform(-1, 1, (B, d)), jnp.float32)
    ref = jax.vmap(lambda th, a, b: smoothness_cost_per_timestep_batch(
        ops, th, a, b))(cand, q0, qN)                   # [B, C, N+2]
    tm = smoothness_cost_per_timestep_tm(
        ops, jnp.transpose(cand, (2, 3, 0, 1)), q0, qN)
    np.testing.assert_allclose(np.asarray(tm), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_update_tm_cand_matches_vmap_update():
    """δθ from ΣP·cand − θ·ΣP (no eps materialization) == Σ P ε form."""
    ops = _ops()
    B, K, d, N = 4, 6, 3, 24
    rng = np.random.default_rng(4)
    theta = jnp.asarray(rng.uniform(-1, 1, (B, N, d)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((B, K, N, d)), jnp.float32)
    cand = theta[:, None] + eps
    S = jnp.asarray(rng.uniform(0, 5, (B, K, N)), jnp.float32)
    ref = jax.vmap(lambda e, s: pi2.update(e, s, ops.M, 10.0))(eps, S)
    got = pi2.update_tm_cand(jnp.transpose(cand, (2, 3, 0, 1)),
                             jnp.transpose(theta, (1, 2, 0)), S, ops.M, 10.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
