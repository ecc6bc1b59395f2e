"""Batched forward kinematics + point Jacobians for serial chains.

Reference equivalents (SURVEY §3.1): orocos-KDL frame composition plus the
package's custom ``TreeFkSolverJointPosAxis`` solvers, which return every
segment frame *and* joint origins/axes in one pass precisely so point
Jacobians can be formed without per-point chain solves. This module is the
same idea, TPU-first: one `lax.scan` down the chain yields all joint frames,
origins, and world axes; bodies and Jacobians are vectorized gathers on top.

Batching: every function takes a single configuration q[d]; callers `vmap`
over waypoints, rollouts, and scenarios (SURVEY §4.3 device mapping). Under
vmap, the per-joint 3x3 algebra becomes large batched einsums that XLA fuses
and vectorizes on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpustomp.robot.model import RobotSpec, PRISMATIC

# 3x3 frame algebra is negligible FLOPs but position accuracy feeds the SDF
# margins — keep it true-fp32 rather than bf16 MXU rounding.
_HI = jax.lax.Precision.HIGHEST
_mm = lambda a, b: jnp.matmul(a, b, precision=_HI)


def rodrigues(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix about unit `axis` by `angle` (Rodrigues formula)."""
    x, y, z = axis[0], axis[1], axis[2]
    K = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]], dtype=axis.dtype)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=axis.dtype) + s * K + (1.0 - c) * _mm(K, K)


def fk_frames(robot: RobotSpec, q: jnp.ndarray):
    """All joint frames for one configuration.

    Returns (pos [d,3] joint origins, rot [d,3,3] post-joint rotations,
    axis_w [d,3] joint axes in world frame).
    """

    def step(carry, inp):
        p, R = carry
        jtype, axis, offset, rot_fixed, qi = inp
        p_j = p + _mm(R, offset)
        R_mid = _mm(R, rot_fixed)
        axis_w = _mm(R_mid, axis)
        is_prism = (jtype == PRISMATIC)
        R_new = jnp.where(is_prism, R_mid, _mm(R_mid, rodrigues(axis, qi)))
        p_new = jnp.where(is_prism, p_j + axis_w * qi, p_j)
        return (p_new, R_new), (p_j, R_new, axis_w)

    init = (robot.base_pos.astype(q.dtype), robot.base_rot.astype(q.dtype))
    xs = (robot.joint_type, robot.joint_axis.astype(q.dtype),
          robot.joint_offset.astype(q.dtype), robot.joint_rot.astype(q.dtype), q)
    # fully unrolled: d <= ~10 joints, and a rolled scan would put a nested
    # while loop inside the solver's iteration loop (launch-latency-bound)
    _, (pos, rot, axis_w) = jax.lax.scan(step, init, xs, unroll=True)
    return pos, rot, axis_w


def body_positions(robot: RobotSpec, q: jnp.ndarray) -> jnp.ndarray:
    """World positions of the sphere bodies: [B, 3]."""
    pos, rot, _ = fk_frames(robot, q)
    link_p = pos[robot.body_link]                     # [B, 3] joint origins
    link_R = rot[robot.body_link]                     # [B, 3, 3]
    return link_p + jnp.einsum("bij,bj->bi", link_R,
                               robot.body_offset.astype(q.dtype),
                               precision=_HI)


def body_positions_and_jacobians(robot: RobotSpec, q: jnp.ndarray):
    """Sphere positions [B,3] and point Jacobians J [B,3,d] (CHOMP, A.11).

    For a serial chain, joint i moves body b iff i <= body_link[b]:
    revolute column  w_i x (x_b - p_i), prismatic column w_i.
    """
    pos, rot, axis_w = fk_frames(robot, q)
    link_p = pos[robot.body_link]
    link_R = rot[robot.body_link]
    x = link_p + jnp.einsum("bij,bj->bi", link_R,
                            robot.body_offset.astype(q.dtype), precision=_HI)

    rel = x[:, None, :] - pos[None, :, :]             # [B, d, 3]
    rev_cols = jnp.cross(axis_w[None, :, :], rel)     # [B, d, 3]
    prism = (robot.joint_type == PRISMATIC)[None, :, None]
    cols = jnp.where(prism, axis_w[None, :, :], rev_cols)
    d = robot.num_joints
    mask = (jnp.arange(d)[None, :] <= robot.body_link[:, None])[:, :, None]
    J = jnp.where(mask, cols, 0.0)                    # [B, d, 3]
    return x, jnp.swapaxes(J, 1, 2)                   # [B, 3, d]


# Convenience batched forms (waypoint axis), used by the cost pipeline.
body_positions_traj = jax.vmap(body_positions, in_axes=(None, 0))
body_pos_jac_traj = jax.vmap(body_positions_and_jacobians, in_axes=(None, 0))
