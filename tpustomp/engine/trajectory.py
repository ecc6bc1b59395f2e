"""Trajectory representation and min-jerk initialization.

Reference equivalent: ``StompTrajectory`` (SURVEY §3.1) — an Eigen matrix with
endpoint padding plus ``fillInMinJerk``. Here θ is just a [N, d] array of the
free interior waypoints; the fixed endpoints live in the ProblemSpec and are
concatenated on demand (`full_trajectory`). No padding exists anywhere — the
finite-difference boundary handling is folded into the operator bias
(dynamics/smoothness.py), so noise and updates are exactly zero at endpoints
by construction (SURVEY §8.1).
"""

from __future__ import annotations

import jax.numpy as jnp


def min_jerk_init(q0: jnp.ndarray, qN: jnp.ndarray, N: int) -> jnp.ndarray:
    """Min-jerk interpolation at the N interior waypoints (A.1).

    s(u) = 10u³ − 15u⁴ + 6u⁵ gives zero velocity and acceleration at both
    endpoints. q0, qN: [d] -> θ [N, d].
    """
    u = (jnp.arange(1, N + 1, dtype=q0.dtype) / (N + 1))[:, None]
    s = 10.0 * u**3 - 15.0 * u**4 + 6.0 * u**5
    return q0[None, :] + s * (qN - q0)[None, :]


def full_trajectory(theta: jnp.ndarray, q0: jnp.ndarray, qN: jnp.ndarray) -> jnp.ndarray:
    """[N, d] free waypoints -> [N+2, d] true trajectory with endpoints."""
    return jnp.concatenate([q0[None, :], theta, qN[None, :]], axis=0)


def wrap_goal(q0: jnp.ndarray, qN: jnp.ndarray,
              limited: jnp.ndarray) -> jnp.ndarray:
    """Shortest-path goal for continuous (wrap-around) joints.

    Reference equivalent: the angle-normalization utilities in
    ``stomp_utils.h`` + per-joint wrap-around flags in ``StompRobotModel``
    (SURVEY §3.1): a goal 350° away should take the −10° path. For joints
    with `limited=False` the goal is replaced by the equivalent angle whose
    delta from q0 lies in (−π, π]; limited joints pass through unchanged
    (their configuration space does not wrap).
    """
    delta = qN - q0
    wrapped = delta - 2.0 * jnp.pi * jnp.round(delta / (2.0 * jnp.pi))
    return jnp.where(limited, qN, q0 + wrapped)
