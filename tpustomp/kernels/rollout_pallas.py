"""Fused rollout-evaluation Pallas kernel: FK → sphere bodies → SDF →
potential → velocity scaling → per-waypoint reduce, in one VMEM pass.

Reference equivalent: the §4.4 hot loop (SURVEY) —
``StompOptimizer::performForwardKinematics`` + collision-point potential
evaluation, the ~80-90% of reference wall time. SURVEY §8.1 anticipated this
kernel (kernels/rollout_pallas.py) with the XLA path as fallback.

Why Pallas: XLA evaluates the FK chain as ~20 fused elementwise kernels whose
[C, T, 3x3] intermediates round-trip HBM. This kernel keeps the whole chain
(frames, body positions, distances) in VMEM: HBM traffic drops to one read
of the trajectories + one write of the cost rows.

Layout: candidates tile over a grid; inside a tile every scalar field is a
[TILE_C, T] block (sublane = candidate, lane = waypoint), so frame algebra is
elementwise VPU work and the time-axis coupling (workspace velocity central
differences) is lane rolls. The joint chain and the body set are ROLLED
`fori_loop`s whose per-iteration parameters (axes, offsets, fixed rotations,
attachments, radii) live in SMEM — Mosaic assigns a VMEM stack slot to every
unrolled temporary, so unrolled variants blow the 16 MB scoped-VMEM limit at
useful tile sizes (measured: 44 MB at TILE_C=64 unrolled vs ~4 MB rolled).

Specialization: built per (world primitives, shapes); robot params are SMEM
inputs. Analytic worlds, revolute chains (grid SDF / prismatic joints use
the XLA path; SURVEY §8.3 part 1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_C = 64  # candidates per tile (multiple of 8)


def build_rollout_kernel(robot, world, num_waypoints: int, dt: float,
                         clearance: float, interpret: bool = False,
                         tile_c: int | None = None):
    """Build the fused evaluator for static (world, T=num_waypoints).

    Returns fn(cand_full [C, T, d]) -> (q_obs [C, T], margin_row [C, T]);
    C must be a multiple of the tile size (caller pads).
    """
    tile = tile_c or TILE_C
    jtypes = np.asarray(robot.joint_type)
    if np.any(jtypes != 0):
        raise NotImplementedError("pallas kernel supports revolute chains; "
                                  "use the XLA path for prismatic joints")
    d = int(np.asarray(robot.joint_axis).shape[0])
    n_bodies = int(np.asarray(robot.body_link).shape[0])
    T = num_waypoints

    base_pos = np.asarray(robot.base_pos, np.float32)
    base_rot = np.asarray(robot.base_rot, np.float32)
    spheres = np.asarray(world.sphere_center, np.float64).reshape(-1, 3)
    sphere_r = np.asarray(world.sphere_radius, np.float64).reshape(-1)
    boxes_c = np.asarray(world.box_center, np.float64).reshape(-1, 3)
    boxes_h = np.asarray(world.box_half, np.float64).reshape(-1, 3)

    def kernel(axis_ref, off_ref, rotf_ref, blink_ref, boff_ref, brad_ref,
               cand_ref, q_obs_ref, margin_ref, frames_ref):
        # SMEM params: axis[d,3] off[d,3] rotf[d,9] blink[n_bodies]
        #              boff[n_bodies,3] brad[n_bodies]
        # cand_ref: [d, TILE_C, T] (joint-major so the rolled loop indexes
        # the leading dim); frames_ref: VMEM scratch [d, 12, TILE_C, T]
        # holding (R row-major 0..8, p 9..11) per joint.
        zero = jnp.zeros((tile, T), jnp.float32)
        inv2dt = 1.0 / (2.0 * dt)
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, T), 1)

        # ---- FK: rolled loop over joints, frames staged to scratch ----
        def fk_body(j, carry):
            p0, p1, p2, R = carry          # p fields + 9-tuple R
            o0, o1, o2 = off_ref[j, 0], off_ref[j, 1], off_ref[j, 2]
            p0 = p0 + R[0] * o0 + R[1] * o1 + R[2] * o2
            p1 = p1 + R[3] * o0 + R[4] * o1 + R[5] * o2
            p2 = p2 + R[6] * o0 + R[7] * o1 + R[8] * o2
            # R <- R @ rot_fixed[j]
            F = [rotf_ref[j, k] for k in range(9)]
            R = tuple(R[3 * i + 0] * F[0 + c] + R[3 * i + 1] * F[3 + c]
                      + R[3 * i + 2] * F[6 + c]
                      for i in range(3) for c in range(3))
            # R <- R @ rodrigues(axis[j], q_j)
            x, y, z = axis_ref[j, 0], axis_ref[j, 1], axis_ref[j, 2]
            qj = cand_ref[j, :, :]
            s, c = jnp.sin(qj), jnp.cos(qj)
            oc = 1.0 - c
            G = (c + x * x * oc, x * y * oc - z * s, x * z * oc + y * s,
                 y * x * oc + z * s, c + y * y * oc, y * z * oc - x * s,
                 z * x * oc - y * s, z * y * oc + x * s, c + z * z * oc)
            R = tuple(R[3 * i + 0] * G[0 + cc] + R[3 * i + 1] * G[3 + cc]
                      + R[3 * i + 2] * G[6 + cc]
                      for i in range(3) for cc in range(3))
            for k in range(9):
                frames_ref[j, k, :, :] = R[k]
            frames_ref[j, 9, :, :] = p0
            frames_ref[j, 10, :, :] = p1
            frames_ref[j, 11, :, :] = p2
            return (p0, p1, p2, R)

        init = (zero + float(base_pos[0]), zero + float(base_pos[1]),
                zero + float(base_pos[2]),
                tuple(zero + float(base_rot[i // 3, i % 3]) for i in range(9)))
        jax.lax.fori_loop(0, d, fk_body, init)

        # ---- cost: rolled loop over bodies reading staged frames ----
        def body_fn(b, carry):
            q_obs, margin = carry
            link = blink_ref[b]
            o0, o1, o2 = boff_ref[b, 0], boff_ref[b, 1], boff_ref[b, 2]
            radius = brad_ref[b]
            bx0 = (frames_ref[link, 9, :, :] + frames_ref[link, 0, :, :] * o0
                   + frames_ref[link, 1, :, :] * o1
                   + frames_ref[link, 2, :, :] * o2)
            bx1 = (frames_ref[link, 10, :, :] + frames_ref[link, 3, :, :] * o0
                   + frames_ref[link, 4, :, :] * o1
                   + frames_ref[link, 5, :, :] * o2)
            bx2 = (frames_ref[link, 11, :, :] + frames_ref[link, 6, :, :] * o0
                   + frames_ref[link, 7, :, :] * o1
                   + frames_ref[link, 8, :, :] * o2)
            bx = (bx0, bx1, bx2)

            dist = zero + 1e6
            for sidx in range(spheres.shape[0]):
                r0 = bx0 - float(spheres[sidx][0])
                r1 = bx1 - float(spheres[sidx][1])
                r2 = bx2 - float(spheres[sidx][2])
                ds = jnp.sqrt(r0 * r0 + r1 * r1 + r2 * r2) - float(sphere_r[sidx])
                dist = jnp.minimum(dist, ds)
            for bidx in range(boxes_c.shape[0]):
                qs = [jnp.abs(bx[i] - float(boxes_c[bidx][i]))
                      - float(boxes_h[bidx][i]) for i in range(3)]
                o_0 = jnp.maximum(qs[0], 0.0)
                o_1 = jnp.maximum(qs[1], 0.0)
                o_2 = jnp.maximum(qs[2], 0.0)
                outside = jnp.sqrt(o_0 * o_0 + o_1 * o_1 + o_2 * o_2)
                inside = jnp.minimum(jnp.maximum(jnp.maximum(qs[0], qs[1]),
                                                 qs[2]), 0.0)
                dist = jnp.minimum(dist, outside + inside)

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
            return (q_obs + pot * speed, jnp.minimum(margin, dist - radius))

        q_obs, margin = jax.lax.fori_loop(0, n_bodies, body_fn,
                                          (zero, zero + 1e6))
        q_obs_ref[:, :] = q_obs * dt
        margin_ref[:, :] = margin

    axis_arr = jnp.asarray(np.asarray(robot.joint_axis), jnp.float32)
    off_arr = jnp.asarray(np.asarray(robot.joint_offset), jnp.float32)
    rotf_arr = jnp.asarray(
        np.asarray(robot.joint_rot).reshape(d, 9), jnp.float32)
    blink_arr = jnp.asarray(np.asarray(robot.body_link), jnp.int32)
    boff_arr = jnp.asarray(np.asarray(robot.body_offset), jnp.float32)
    brad_arr = jnp.asarray(np.asarray(robot.body_radius), jnp.float32)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def fn(cand_full: jnp.ndarray):
        C = cand_full.shape[0]
        assert C % tile == 0, f"pad candidate count to {tile} (got {C})"
        cand_jm = jnp.transpose(cand_full.astype(jnp.float32), (2, 0, 1))
        return pl.pallas_call(
            kernel,
            grid=(C // tile,),
            in_specs=[smem, smem, smem, smem, smem, smem,
                      pl.BlockSpec((d, tile, T), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((tile, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((C, T), jnp.float32),
                       jax.ShapeDtypeStruct((C, T), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((d, 12, tile, T), jnp.float32)],
            interpret=interpret,
        )(axis_arr, off_arr, rotf_arr, blink_arr, boff_arr, brad_arr, cand_jm)

    return fn
