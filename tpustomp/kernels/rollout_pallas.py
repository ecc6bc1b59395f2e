"""Fused rollout-evaluation Pallas kernel: FK → sphere bodies → SDF →
potential → velocity scaling → per-waypoint reduce, in one VMEM pass.

Reference equivalent: the §4.4 hot loop (SURVEY) —
``StompOptimizer::performForwardKinematics`` + collision-point potential
evaluation, the ~80-90% of reference wall time. SURVEY §8.1 anticipated this
kernel (kernels/rollout_pallas.py) with the XLA path as fallback.

Why Pallas: XLA evaluates the FK chain as ~20 fused elementwise kernels whose
[C, T, 3x3] intermediates round-trip HBM — measured HBM-bandwidth-bound at
large candidate counts. This kernel keeps the whole chain (positions,
rotations, body positions, distances) in VMEM scratch/registers: HBM traffic
drops to one read of the trajectories + one write of the cost rows.

Layout: candidates tile over a grid; inside a tile every scalar field is a
[TILE_C, T] 2-D block (sublane = candidate, lane = waypoint), so all frame
algebra is elementwise VPU work and the time-axis coupling (workspace
velocity central differences) is static slicing along lanes.

Specialization: the kernel is built per (robot, world, shapes) — the chain
structure, sphere attachment, and primitive list unroll statically. Analytic
worlds only (grid SDF keeps the XLA gather path; SURVEY §8.3 part 1).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_C = 64  # candidates per tile (sublane dimension; multiple of 8)


def _rot_apply(R, v):
    """R: tuple of 9 [TC,T] fields (row-major), v: 3 fields -> 3 fields."""
    return (
        R[0] * v[0] + R[1] * v[1] + R[2] * v[2],
        R[3] * v[0] + R[4] * v[1] + R[5] * v[2],
        R[6] * v[0] + R[7] * v[1] + R[8] * v[2],
    )


def _rot_mul(A, B):
    """3x3 @ 3x3 on 9-field tuples."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(A[3 * i + 0] * B[0 + j] + A[3 * i + 1] * B[3 + j]
                       + A[3 * i + 2] * B[6 + j])
    return tuple(out)


def _const_fields(mat, like):
    """Broadcast a static 3x3 numpy matrix to 9 [TC,T] constant fields."""
    return tuple(jnp.full_like(like, float(mat[i // 3, i % 3]))
                 for i in range(9))


def build_rollout_kernel(robot, world, num_waypoints: int, dt: float,
                         clearance: float, interpret: bool = False):
    """Build the fused evaluator for static (robot, world, T=num_waypoints).

    robot: RobotSpec (host-read; values baked into the kernel).
    world: AnalyticWorld (sphere/box primitives baked in).
    Returns fn(cand_full [C, T, d]) -> (q_obs [C, T], margin_row [C, T])
    with C a multiple of TILE_C (caller pads).
    """
    # --- pull static structure to host ---------------------------------
    axes = np.asarray(robot.joint_axis, np.float64)
    offsets = np.asarray(robot.joint_offset, np.float64)
    rot_fixed = np.asarray(robot.joint_rot, np.float64)
    jtypes = np.asarray(robot.joint_type)
    base_pos = np.asarray(robot.base_pos, np.float64)
    base_rot = np.asarray(robot.base_rot, np.float64)
    body_link = [int(b) for b in np.asarray(robot.body_link)]
    body_offset = np.asarray(robot.body_offset, np.float64)
    body_radius = np.asarray(robot.body_radius, np.float64)
    spheres = np.asarray(world.sphere_center, np.float64).reshape(-1, 3)
    sphere_r = np.asarray(world.sphere_radius, np.float64).reshape(-1)
    boxes_c = np.asarray(world.box_center, np.float64).reshape(-1, 3)
    boxes_h = np.asarray(world.box_half, np.float64).reshape(-1, 3)
    d = axes.shape[0]
    T = num_waypoints
    if np.any(jtypes != 0):
        raise NotImplementedError("pallas kernel supports revolute chains; "
                                  "use the XLA path for prismatic joints")

    n_bodies = len(body_link)

    def kernel(radius_ref, cand_ref, q_obs_ref, margin_ref, xb_ref, rp_ref):
        # radius_ref: [n_bodies] SMEM; cand_ref: [TILE_C, T, d] VMEM;
        # xb_ref: VMEM scratch [n_bodies, 3, TC, T] — a dataflow barrier
        # between the FK phase and the cost phase, so the Mosaic stack only
        # holds one phase's temporaries at a time.
        zero = jnp.zeros((TILE_C, T), jnp.float32)
        inv2dt = 1.0 / (2.0 * dt)
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_C, T), 1)

        def body_cost(b, bx, q_obs, margin):
            """One sphere body's SDF/velocity cost. Called from a ROLLED
            fori_loop so the live set is O(1) regardless of body count
            (Mosaic allocates stack per unrolled temporary)."""
            radius = radius_ref[b]
            dist = zero + 1e6
            for sidx in range(spheres.shape[0]):
                cx, cy, cz = (float(spheres[sidx][0]), float(spheres[sidx][1]),
                              float(spheres[sidx][2]))
                rel0, rel1, rel2 = bx[0] - cx, bx[1] - cy, bx[2] - cz
                ds = jnp.sqrt(rel0 * rel0 + rel1 * rel1 + rel2 * rel2
                              ) - float(sphere_r[sidx])
                dist = jnp.minimum(dist, ds)
            for bidx in range(boxes_c.shape[0]):
                qs = [jnp.abs(bx[i] - float(boxes_c[bidx][i]))
                      - float(boxes_h[bidx][i]) for i in range(3)]
                out0 = jnp.maximum(qs[0], 0.0)
                out1 = jnp.maximum(qs[1], 0.0)
                out2 = jnp.maximum(qs[2], 0.0)
                outside = jnp.sqrt(out0 * out0 + out1 * out1 + out2 * out2)
                inside = jnp.minimum(jnp.maximum(jnp.maximum(qs[0], qs[1]),
                                                 qs[2]), 0.0)
                dist = jnp.minimum(dist, outside + inside)

            # workspace speed: lane shifts via circular roll, wrapped ends
            # overridden by one-sided differences
            sp2 = zero
            for i in range(3):
                xi = bx[i]
                fwd = pltpu.roll(xi, shift=T - 1, axis=1)  # fwd[t] = x[t+1]
                bwd = pltpu.roll(xi, shift=1, axis=1)      # bwd[t] = x[t-1]
                vi = (fwd - bwd) * inv2dt
                vi = jnp.where(t_idx == 0, (fwd - xi) * (2.0 * inv2dt), vi)
                vi = jnp.where(t_idx == T - 1, (xi - bwd) * (2.0 * inv2dt), vi)
                sp2 = sp2 + vi * vi
            speed = jnp.sqrt(sp2)

            d_sig = dist - radius - clearance
            pot = jnp.where(
                d_sig < 0.0, -d_sig + 0.5 * clearance,
                jnp.where(d_sig <= clearance,
                          (d_sig - clearance) ** 2 / (2.0 * clearance), 0.0))
            return (q_obs + pot * speed,
                    jnp.minimum(margin, dist - radius))

        # ---- FK down the chain, staging body positions to scratch ----
        # The frame state (R, p) round-trips the rp_ref scratch after every
        # joint: the store/load breaks the unrolled expression tree's live
        # ranges, keeping the Mosaic VMEM stack bounded per joint.
        p = tuple(zero + float(base_pos[i]) for i in range(3))
        R = _const_fields(base_rot, zero)
        for j in range(d):
            if j > 0:
                R = tuple(rp_ref[k, :, :] for k in range(9))
                p = tuple(rp_ref[9 + i, :, :] for i in range(3))
            off = offsets[j]
            p = tuple(p[i] + R[3 * i + 0] * float(off[0])
                      + R[3 * i + 1] * float(off[1])
                      + R[3 * i + 2] * float(off[2]) for i in range(3))
            if not np.allclose(rot_fixed[j], np.eye(3)):
                R = _rot_mul(R, _const_fields(rot_fixed[j], zero))
            qj = cand_ref[:, :, j]                    # [TC, T]
            s, c = jnp.sin(qj), jnp.cos(qj)
            ax = axes[j]
            x, y, z = float(ax[0]), float(ax[1]), float(ax[2])
            one_c = 1.0 - c
            # Rodrigues as 9 fields
            Rj = (c + x * x * one_c, x * y * one_c - z * s, x * z * one_c + y * s,
                  y * x * one_c + z * s, c + y * y * one_c, y * z * one_c - x * s,
                  z * x * one_c - y * s, z * y * one_c + x * s, c + z * z * one_c)
            R = _rot_mul(R, Rj)
            for k in range(9):
                rp_ref[k, :, :] = R[k]
            for i in range(3):
                rp_ref[9 + i, :, :] = p[i]
            for b, link in enumerate(body_link):
                if link == j:
                    bo = body_offset[b]
                    for i in range(3):
                        xb_ref[b, i, :, :] = (
                            p[i] + R[3 * i + 0] * float(bo[0])
                            + R[3 * i + 1] * float(bo[1])
                            + R[3 * i + 2] * float(bo[2]))

        # ---- cost phase: rolled loop over staged body positions ----
        def loop_body(b, carry):
            q_obs, margin = carry
            bx = (xb_ref[b, 0, :, :], xb_ref[b, 1, :, :], xb_ref[b, 2, :, :])
            return body_cost(b, bx, q_obs, margin)

        q_obs, margin = jax.lax.fori_loop(0, n_bodies, loop_body,
                                          (zero, zero + 1e6))
        q_obs_ref[:, :] = q_obs * dt
        margin_ref[:, :] = margin

    def fn(cand_full: jnp.ndarray):
        C = cand_full.shape[0]
        assert C % TILE_C == 0, f"pad candidate count to {TILE_C} (got {C})"
        radius_arr = jnp.asarray(body_radius, jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(C // TILE_C,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((TILE_C, T, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((TILE_C, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_C, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((C, T), jnp.float32),
                       jax.ShapeDtypeStruct((C, T), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((n_bodies, 3, TILE_C, T), jnp.float32),
                pltpu.VMEM((12, TILE_C, T), jnp.float32)],
            interpret=interpret,
        )(radius_arr, cand_full.astype(jnp.float32))

    return fn
