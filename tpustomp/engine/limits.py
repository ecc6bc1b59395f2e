"""Joint-limit handling: smoothness-preserving projection inside jit.

Reference equivalent: ``StompOptimizer::handleJointLimits`` (SURVEY §3.1) —
iteratively finds the worst violation at waypoint t*, adds a multiple of the
R⁻¹ column through t* (so the correction is maximally smooth and endpoint-
preserving), and repeats until clean.

TPU formulation (SURVEY §8.3 hard part 3): the data-dependent repeat becomes
a fixed `fori_loop` with `joint_limit_iterations` trips (a no-op once clean,
since the violation is zero), followed by a hard clamp that guarantees
feasibility. Vectorized over joints with vmap; unlimited (continuous) joints
pass through untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def project_limits(theta: jnp.ndarray, lower: jnp.ndarray, upper: jnp.ndarray,
                   limited: jnp.ndarray, Rinv: jnp.ndarray,
                   iterations: int) -> jnp.ndarray:
    """theta [N, d] -> limit-feasible [N, d] (A.7)."""

    def per_joint(th, lo, hi, lim):
        def body(_, th):
            viol = jnp.maximum(th - hi, 0.0) + jnp.minimum(th - lo, 0.0)
            t_star = jnp.argmax(jnp.abs(viol))
            v = viol[t_star]
            col = Rinv[:, t_star] / Rinv[t_star, t_star]
            return th - v * col

        smoothed = jax.lax.fori_loop(0, iterations, body, th)
        clamped = jnp.clip(smoothed, lo, hi)
        return jnp.where(lim, clamped, th)

    return jax.vmap(per_joint, in_axes=(1, 0, 0, 0), out_axes=1)(
        theta, lower, upper, limited)
