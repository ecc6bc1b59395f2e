"""Device-side smoothness (control) cost: 1/2 Σ_j Σ_d w_d ||A_d θ_j + B_d q_j||².

Reference equivalent: ``CovariantTrajectoryPolicy::computeControlCosts`` /
``StompCost`` (SURVEY §3.1); contract SURVEY A.2. The endpoint bias B q
replaces the reference's duplicated-endpoint padding (SURVEY §8.1).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpustomp.dynamics.device import DeviceOps


def smoothness_cost(ops: DeviceOps, theta: jnp.ndarray,
                    q0: jnp.ndarray, qN: jnp.ndarray) -> jnp.ndarray:
    """theta [N, d]; q0, qN [d] -> scalar cost."""
    q = jnp.stack([q0, qN], axis=0)                     # [2, d]
    deriv = (jnp.einsum("arn,nd->ard", ops.A_stack, theta)
             + jnp.einsum("arq,qd->ard", ops.B_stack, q))  # [D, N+2, d]
    per_d = 0.5 * jnp.sum(deriv * deriv, axis=(1, 2))      # [D]
    return jnp.dot(ops.w, per_d)


def smoothness_gradient(ops: DeviceOps, theta: jnp.ndarray,
                        q0: jnp.ndarray, qN: jnp.ndarray) -> jnp.ndarray:
    """∂cost/∂θ = R θ + R_bias [q0; qN]  (CHOMP smoothness term, A.11)."""
    q = jnp.stack([q0, qN], axis=0)
    return ops.R @ theta + ops.R_bias @ q
