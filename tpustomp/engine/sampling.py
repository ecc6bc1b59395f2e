"""Noisy rollout generation: ε ~ N(0, σ² R⁻¹-shaped), batched over K and d.

Reference equivalents: ``PolicyImprovement::generateRollouts`` +
``MultivariateGaussian`` (SURVEY §3.1, A.3). The reference loops K×d calls of
an Eigen Cholesky sampler; here one einsum applies the precomputed factor L
(= chol(R⁻¹ / max|R⁻¹|), dynamics/smoothness.py) to a [K, N, d] standard
normal block — an MXU matmul.

Rollout *reuse* (the reference keeps the best `num_rollouts_reused` rollouts,
noise retained) is handled in engine/solver.py by carrying the kept rollouts'
trajectories in the solver state; their noise relative to the *current* θ is
re-derived as ε_k = θ_k − θ, matching the reference's re-centering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_noise(key: jax.Array, L: jnp.ndarray, sigma: jnp.ndarray,
                 num_rollouts: int) -> jnp.ndarray:
    """Draw ε [K, N, d] with per-joint scale sigma [d] (A.3).

    ε_kj = σ_j · L z_kj with z standard normal; endpoints are exactly zero by
    construction because L acts only on free waypoints.

    z is drawn in (d, K, N) axis order — the SAME flat PRNG stream order as
    `sample_noise_tm`'s per-scenario draw, so the batched time-major solver
    path produces the same noise as this per-scenario path up to dot
    reassociation (~1e-7; the equality tests between solve_batch /
    vmap(solve) / backends depend on the shared draw). Distribution is
    unchanged (iid normals; axis order is labeling).
    """
    N = L.shape[0]
    d = sigma.shape[0]
    z = jax.random.normal(key, (d, num_rollouts, N), dtype=L.dtype)
    return jnp.einsum("nm,dkm->knd", L, z) * sigma[None, None, :]


def sample_noise_tm(keys: jax.Array, L: jnp.ndarray, sigma: jnp.ndarray,
                    num_rollouts: int) -> jnp.ndarray:
    """Batched TIME-MAJOR draw: keys [B], sigma [B, d] (per-scenario decay
    folded in by the caller) -> ε_tm [N, d, B, K].

    Produces exactly `vmap(sample_noise)(keys)` transposed to [n, d, b, k] —
    same per-key z values (vmap of the same draw), same contraction over the
    waypoint axis — but materializes directly in the fused kernel's
    lane-major layout: the einsum's dot_general emits [n][d, b, k] with no
    transpose at all (rhs non-contracting order is (d, b, k) because
    out_axes=1 interleaves the scenario axis), where the scenario-major
    layout costs a pathological [B·C, T, d] -> [d, T, B·C] permute
    (~0.57 ms at B=256 on v5e, 14% of HBM bandwidth).
    """
    d = sigma.shape[1]
    N = L.shape[0]
    z = jax.vmap(lambda k: jax.random.normal(k, (d, num_rollouts, N),
                                             dtype=L.dtype),
                 out_axes=1)(keys)                      # [d, B, K, N]
    eps = jnp.einsum("nm,dbkm->ndbk", L, z)
    return eps * jnp.transpose(sigma)[None, :, :, None]
