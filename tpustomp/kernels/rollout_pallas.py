"""Fused rollout-evaluation Pallas kernels: FK → sphere bodies → SDF →
potential → velocity scaling → per-waypoint reduce, in one VMEM pass.

Reference equivalent: the §4.4 hot loop (SURVEY) —
``StompOptimizer::performForwardKinematics`` + collision-point potential
evaluation, the ~80-90% of reference wall time. SURVEY §8.1 anticipated this
kernel (kernels/rollout_pallas.py); the XLA path remains the fallback on CPU.

Why Pallas: XLA evaluates the FK chain as ~20 fused elementwise kernels whose
[C, T, 3x3] intermediates round-trip HBM. This kernel keeps the whole chain
(frames, body positions, distances) in VMEM: HBM traffic drops to one read
of the trajectories + one write of the cost rows. Measured (TPU v5e, 14336
trajectories x 102 waypoints x 13 bodies): 27 ms vs 41 ms for the XLA path.

Two kernels share the FK stage:
  - ANALYTIC worlds (sphere/box primitives): the full chain through the
    closed-form SDF, potential, and per-waypoint reduce runs in VMEM and
    only two [C, T] cost rows leave the chip.
  - GRID worlds (voxel SDF): Mosaic has no arbitrary per-element 2D gather
    (only lane-axis `take_along_axis` lowers — measured), so the trilinear
    lookup CANNOT live in the kernel. Hybrid split instead: the kernel fuses
    FK → body positions + workspace speeds (the HBM-heavy stage: ~20x less
    traffic than XLA's materialized frame chain) and writes one compact
    [B, 4, C, T] tensor; XLA then does gather → trilinear → potential →
    reduce, which it already fuses well (world/sdf.py).

Layout: candidates tile over a grid; inside a tile every scalar field is a
[tile, T] block (sublane = candidate, lane = waypoint), so frame algebra is
elementwise VPU work and the time-axis coupling (workspace velocity central
differences) is lane rolls. The joint chain, body set, and world primitives
are ROLLED `fori_loop`s whose per-iteration parameters live in SMEM — Mosaic
assigns a VMEM stack slot to every unrolled temporary, so unrolled variants
blow the 16 MB scoped-VMEM limit at useful tile sizes (measured: 44 MB at
tile 64 unrolled vs ~4 MB rolled). Loop-carry inits are anchored to a loaded
value (`mzero`) because splat-constant carries trip Mosaic's replicated-
layout check.

Joint types: revolute and prismatic both supported; the joint motion is a
Rodrigues rotation blended to identity for prismatic joints plus a
translation along the world-frame joint axis (matches robot/fk.py —
post-joint-motion origins are what bodies ride on).

Only SHAPES are static: robot and world parameters are traced SMEM inputs,
so the kernel builder can be used inside jit with robot/world as arguments
(one compilation per shape signature, as everywhere else in the engine).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_C = 64  # candidates per tile (multiple of 8)


def supports(robot, world) -> bool:
    """Concrete-time check: can the pallas path evaluate this problem?

    All three world kinds are covered (analytic fully fused; grid and
    grid+overlay composite via the hybrid kinematics kernel) and both joint
    types; anything else (a custom world class) falls back to XLA.
    """
    from tpustomp.world.sdf import AnalyticWorld, CompositeWorld, GridSDF

    return isinstance(world, (AnalyticWorld, GridSDF, CompositeWorld))


def _fk_stage(d, type_ref, axis_ref, off_ref, rotf_ref, base_ref, cand_ref,
              frames_ref, mzero, skip_rotf=False):
    """Rolled FK over the joint chain; frames staged to VMEM scratch.

    frames_ref[j] holds (R row-major 0..8, p 9..11) of joint j's
    post-joint-motion frame as [12, tile, T] fields. `skip_rotf` (static,
    from RobotSpec.rot_fixed_identity) elides the R @ rot_fixed multiply —
    ~40% of the FK field-ops when every fixed rotation is identity.
    """

    def fk_body(j, carry):
        p0, p1, p2, R = carry          # p fields + 9-tuple R
        o0, o1, o2 = off_ref[j, 0], off_ref[j, 1], off_ref[j, 2]
        p0 = p0 + R[0] * o0 + R[1] * o1 + R[2] * o2
        p1 = p1 + R[3] * o0 + R[4] * o1 + R[5] * o2
        p2 = p2 + R[6] * o0 + R[7] * o1 + R[8] * o2
        if not skip_rotf:
            # R <- R @ rot_fixed[j]
            F = [rotf_ref[j, k] for k in range(9)]
            R = tuple(R[3 * i + 0] * F[0 + c] + R[3 * i + 1] * F[3 + c]
                      + R[3 * i + 2] * F[6 + c]
                      for i in range(3) for c in range(3))
        x, y, z = axis_ref[j, 0], axis_ref[j, 1], axis_ref[j, 2]
        qj = cand_ref[j, :, :]
        rev = jnp.where(type_ref[j] == 0, 1.0, 0.0)  # scalar blend factor
        # prismatic: translate along the world-frame axis (R @ axis) by q_j
        aw0 = R[0] * x + R[1] * y + R[2] * z
        aw1 = R[3] * x + R[4] * y + R[5] * z
        aw2 = R[6] * x + R[7] * y + R[8] * z
        tq = (1.0 - rev) * qj
        p0 = p0 + aw0 * tq
        p1 = p1 + aw1 * tq
        p2 = p2 + aw2 * tq
        # revolute: R <- R @ rodrigues(axis[j], q_j); identity for prismatic
        s, c = jnp.sin(qj), jnp.cos(qj)
        oc = 1.0 - c
        G = (c + x * x * oc, x * y * oc - z * s, x * z * oc + y * s,
             y * x * oc + z * s, c + y * y * oc, y * z * oc - x * s,
             z * x * oc - y * s, z * y * oc + x * s, c + z * z * oc)
        eye = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
        G = tuple(rev * g + (1.0 - rev) * e for g, e in zip(G, eye))
        R = tuple(R[3 * i + 0] * G[0 + cc] + R[3 * i + 1] * G[3 + cc]
                  + R[3 * i + 2] * G[6 + cc]
                  for i in range(3) for cc in range(3))
        for k in range(9):
            frames_ref[j, k, :, :] = R[k]
        frames_ref[j, 9, :, :] = p0
        frames_ref[j, 10, :, :] = p1
        frames_ref[j, 11, :, :] = p2
        return (p0, p1, p2, R)

    init = (mzero + base_ref[9], mzero + base_ref[10],
            mzero + base_ref[11],
            tuple(mzero + base_ref[k] for k in range(9)))
    jax.lax.fori_loop(0, d, fk_body, init)


def _body_position(frames_ref, blink_ref, boff_ref, b):
    """World position of sphere body b from the staged frames."""
    link = blink_ref[b]
    o0, o1, o2 = boff_ref[b, 0], boff_ref[b, 1], boff_ref[b, 2]
    bx0 = (frames_ref[link, 9, :, :] + frames_ref[link, 0, :, :] * o0
           + frames_ref[link, 1, :, :] * o1
           + frames_ref[link, 2, :, :] * o2)
    bx1 = (frames_ref[link, 10, :, :] + frames_ref[link, 3, :, :] * o0
           + frames_ref[link, 4, :, :] * o1
           + frames_ref[link, 5, :, :] * o2)
    bx2 = (frames_ref[link, 11, :, :] + frames_ref[link, 6, :, :] * o0
           + frames_ref[link, 7, :, :] * o1
           + frames_ref[link, 8, :, :] * o2)
    return bx0, bx1, bx2


def _workspace_speed(bx, t_idx, T, inv2dt, mzero, axis=1):
    """‖ẋ_b(t)‖ via central differences over the waypoint axis.

    axis=1: candidate-major [tile, T] blocks (lane rolls);
    axis=0: time-major [T, tile] blocks (sublane rolls)."""
    sp2 = mzero
    for xi in bx:
        fwd = pltpu.roll(xi, shift=T - 1, axis=axis)  # fwd[t] = x[t+1]
        bwd = pltpu.roll(xi, shift=1, axis=axis)      # bwd[t] = x[t-1]
        vi = (fwd - bwd) * inv2dt
        vi = jnp.where(t_idx == 0, (fwd - xi) * (2.0 * inv2dt), vi)
        vi = jnp.where(t_idx == T - 1, (xi - bwd) * (2.0 * inv2dt), vi)
        sp2 = sp2 + vi * vi
    return jnp.sqrt(sp2)


def _compiler_params(d, tile, T):
    """Raise the scoped-VMEM cap when the frames scratch needs it.

    The default 16 MB limit fits tile<=128 at d=7, T=102; bigger tiles are
    legal on v5e (physical VMEM is far larger) but need an explicit cap.
    """
    need = (d * 12 + d + 16) * tile * T * 4  # scratch + cand + in/out blocks
    if need <= 14 * 2**20:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(need * 1.5))


def build_rollout_kernel(shapes, dt: float, clearance: float,
                         interpret: bool = False, tile_c: int | None = None,
                         skip_rotf: bool = False):
    """Build the fully fused evaluator (ANALYTIC worlds).

    shapes: (d, n_bodies, n_spheres, n_boxes, T).
    Returns fn(cand_full [C, T, d], robot, world) ->
    (q_obs [C, T], margin_row [C, T]); C must be a multiple of the tile.
    """
    d, n_bodies, n_spheres, n_boxes, T = shapes
    tile = tile_c or TILE_C

    def kernel(type_ref, axis_ref, off_ref, rotf_ref, base_ref, blink_ref,
               boff_ref, brad_ref, sph_ref, box_ref, cand_ref, q_obs_ref,
               margin_ref, frames_ref):
        # SMEM params: type[d] axis[d,3] off[d,3] rotf[d,9] base[12]
        #   blink[n_bodies] boff[n_bodies,3] brad[n_bodies]
        #   sph[n_spheres,4] box[n_boxes,6]
        # cand_ref: [d, tile, T] VMEM (joint-major so the rolled loop indexes
        # the leading dim); frames_ref: VMEM scratch [d, 12, tile, T].
        inv2dt = 1.0 / (2.0 * dt)
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, T), 1)
        mzero = cand_ref[0, :, :] * 0.0

        _fk_stage(d, type_ref, axis_ref, off_ref, rotf_ref, base_ref,
                  cand_ref, frames_ref, mzero, skip_rotf=skip_rotf)

        # ---- cost: rolled loop over bodies reading staged frames ----
        def body_fn(b, carry):
            q_obs, margin = carry
            bx = _body_position(frames_ref, blink_ref, boff_ref, b)
            bx0, bx1, bx2 = bx
            radius = brad_ref[b]

            def sphere_fn(sidx, dist):
                r0 = bx0 - sph_ref[sidx, 0]
                r1 = bx1 - sph_ref[sidx, 1]
                r2 = bx2 - sph_ref[sidx, 2]
                ds = jnp.sqrt(r0 * r0 + r1 * r1 + r2 * r2) - sph_ref[sidx, 3]
                return jnp.minimum(dist, ds)

            def box_fn(bidx, dist):
                q0 = jnp.abs(bx0 - box_ref[bidx, 0]) - box_ref[bidx, 3]
                q1 = jnp.abs(bx1 - box_ref[bidx, 1]) - box_ref[bidx, 4]
                q2 = jnp.abs(bx2 - box_ref[bidx, 2]) - box_ref[bidx, 5]
                w0 = jnp.maximum(q0, 0.0)
                w1 = jnp.maximum(q1, 0.0)
                w2 = jnp.maximum(q2, 0.0)
                outside = jnp.sqrt(w0 * w0 + w1 * w1 + w2 * w2)
                inside = jnp.minimum(jnp.maximum(jnp.maximum(q0, q1), q2), 0.0)
                return jnp.minimum(dist, outside + inside)

            dist = mzero + 1e6
            if n_spheres:
                dist = jax.lax.fori_loop(0, n_spheres, sphere_fn, dist)
            if n_boxes:
                dist = jax.lax.fori_loop(0, n_boxes, box_fn, dist)

            speed = _workspace_speed(bx, t_idx, T, inv2dt, mzero)
            d_sig = dist - radius - clearance
            pot = jnp.where(
                d_sig < 0.0, -d_sig + 0.5 * clearance,
                jnp.where(d_sig <= clearance,
                          (d_sig - clearance) ** 2 / (2.0 * clearance), 0.0))
            return (q_obs + pot * speed, jnp.minimum(margin, dist - radius))

        q_obs, margin = jax.lax.fori_loop(0, n_bodies, body_fn,
                                          (mzero, mzero + 1e6))
        q_obs_ref[:, :] = q_obs * dt
        margin_ref[:, :] = margin

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def fn(cand_full: jnp.ndarray, robot, world):
        C = cand_full.shape[0]
        assert C % tile == 0, f"pad candidate count to {tile} (got {C})"
        f32 = jnp.float32
        base = jnp.concatenate([robot.base_rot.reshape(9),
                                robot.base_pos.reshape(3)]).astype(f32)
        sph = jnp.concatenate(
            [world.sphere_center.reshape(-1, 3),
             world.sphere_radius.reshape(-1, 1)], axis=1).astype(f32)
        box = jnp.concatenate(
            [world.box_center.reshape(-1, 3),
             world.box_half.reshape(-1, 3)], axis=1).astype(f32)
        cand_jm = jnp.transpose(cand_full.astype(f32), (2, 0, 1))
        return pl.pallas_call(
            kernel,
            grid=(C // tile,),
            in_specs=[smem] * 10 + [
                pl.BlockSpec((d, tile, T), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((tile, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((C, T), f32),
                       jax.ShapeDtypeStruct((C, T), f32)],
            scratch_shapes=[pltpu.VMEM((d, 12, tile, T), f32)],
            compiler_params=_compiler_params(d, tile, T),
            interpret=interpret,
        )(robot.joint_type.astype(jnp.int32), robot.joint_axis.astype(f32),
          robot.joint_offset.astype(f32),
          robot.joint_rot.reshape(d, 9).astype(f32), base,
          robot.body_link.astype(jnp.int32), robot.body_offset.astype(f32),
          robot.body_radius.astype(f32), sph, box, cand_jm)

    return fn


def build_kinematics_kernel(shapes, dt: float, interpret: bool = False,
                            tile_c: int | None = None,
                            skip_rotf: bool = False):
    """Build the fused FK→(body positions, speeds) evaluator (GRID worlds).

    shapes: (d, n_bodies, T). Returns fn(cand_full [C, T, d], robot) ->
    kin [B, 4, C, T] where kin[:, :3] are world xyz of each sphere body and
    kin[:, 3] is ‖ẋ_b(t)‖. The SDF gather + potential stay in XLA (module
    docstring: Mosaic has no arbitrary 2D gather).
    """
    d, n_bodies, T = shapes
    tile = tile_c or TILE_C

    def kernel(type_ref, axis_ref, off_ref, rotf_ref, base_ref, blink_ref,
               boff_ref, cand_ref, kin_ref, frames_ref):
        inv2dt = 1.0 / (2.0 * dt)
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, T), 1)
        mzero = cand_ref[0, :, :] * 0.0

        _fk_stage(d, type_ref, axis_ref, off_ref, rotf_ref, base_ref,
                  cand_ref, frames_ref, mzero, skip_rotf=skip_rotf)

        def body_fn(b, _):
            bx = _body_position(frames_ref, blink_ref, boff_ref, b)
            kin_ref[b, 0, :, :] = bx[0]
            kin_ref[b, 1, :, :] = bx[1]
            kin_ref[b, 2, :, :] = bx[2]
            kin_ref[b, 3, :, :] = _workspace_speed(bx, t_idx, T, inv2dt,
                                                   mzero)
            return 0

        jax.lax.fori_loop(0, n_bodies, body_fn, 0)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def fn(cand_full: jnp.ndarray, robot):
        C = cand_full.shape[0]
        assert C % tile == 0, f"pad candidate count to {tile} (got {C})"
        f32 = jnp.float32
        base = jnp.concatenate([robot.base_rot.reshape(9),
                                robot.base_pos.reshape(3)]).astype(f32)
        cand_jm = jnp.transpose(cand_full.astype(f32), (2, 0, 1))
        return pl.pallas_call(
            kernel,
            grid=(C // tile,),
            in_specs=[smem] * 7 + [
                pl.BlockSpec((d, tile, T), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_bodies, 4, tile, T),
                                   lambda i: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_bodies, 4, C, T), f32),
            scratch_shapes=[pltpu.VMEM((d, 12, tile, T), f32)],
            compiler_params=_compiler_params(d, tile, T),
            interpret=interpret,
        )(robot.joint_type.astype(jnp.int32), robot.joint_axis.astype(f32),
          robot.joint_offset.astype(f32),
          robot.joint_rot.reshape(d, 9).astype(f32), base,
          robot.body_link.astype(jnp.int32), robot.body_offset.astype(f32),
          cand_jm)

    return fn


def build_unrolled_kernel(shapes, dt: float, clearance: float,
                          body_counts: tuple, mode: str = "analytic",
                          interpret: bool = False,
                          tile_c: int | None = None,
                          skip_rotf: bool = False,
                          time_major: bool = False,
                          per_cand_world: bool = False,
                          with_activity: bool = False,
                          static_joints: tuple | None = None,
                          ee_out: bool = False):
    """Scratch-free fused evaluator: UNROLLED joint loop, each link's bodies
    evaluated inline while the frame is live in registers.

    Requires the static per-joint body partition `body_counts` (bodies
    link-sorted; RobotSpec enforces this at construction). Compared to the
    rolled/staged form this removes the [d, 12, tile, T] frames scratch and
    its ~240 per-program loads/stores — measured 17% faster (3.09 vs 3.70 ms
    for 14,336×102×12 on v5e) with bit-identical outputs. Unrolling is safe
    here precisely because frames are NOT staged: the live set is one frame
    + two accumulators, so Mosaic's per-temporary VMEM stack stays small
    (the staged form unrolled blows the 16 MB scoped limit at tile 64).

    mode: "analytic" -> (q_obs [C,T], margin_row [C,T]) against SMEM
    sphere/box primitives; "kin" -> kin [B, 4, C, T] for the grid hybrid.

    static_joints: optional tuple of per-joint (type, ax, ay, az) as plain
    Python numbers (RobotSpec.joint_static). When given, the unrolled loop
    specializes each joint at TRACE time: axis components that are exactly
    0/±1 fold out of the Rodrigues composition and axis projection, and
    prismatic/revolute branches resolve statically (prismatic joints skip
    sin/cos entirely; revolute joints skip the translation term and the
    G/identity blend). Numerics: the folding removes only exact
    multiplications by literal 0/1. On REAL TPU (Mosaic) the specialized
    kernel is BITWISE-identical to the runtime-axis one (measured max
    diff 0.0 on the 7-joint arm — Mosaic lowers each op separately, no
    FMA-contraction reassociation). Under interpret mode (XLA CPU ops,
    which DO contract FMAs over the shortened sum trees) outputs drift
    ~1 ULP per composed joint (≤4e-6 abs at 7 joints; exact for
    single-axis chains) — well inside every kernel-vs-reference
    tolerance, and the solver's exact-parity tests compare paths sharing
    the SAME kernel, so those stay bitwise everywhere. Measured on v5e at
    the config-4 shape: kernel stage 1.27 → 1.09 ms/iter, full step
    2.10 → 1.85 ms (sustained 6.8M → 7.7M candidate evals/s) — the
    kernel is the dominant stage (docs/PERFORMANCE.md round-4 bisection),
    so this is the main lever on the sustained rollout rate.

    time_major (analytic only): blocks are [T, tile] (sublane = waypoint,
    lane = candidate) instead of [tile, T]. This is the PRODUCTION DEFAULT
    for the unrolled analytic path (2.46x on v5e — see docs/PERFORMANCE.md;
    `TPUSTOMP_PALLAS_LAYOUT=cm` is the candidate-major A/B escape hatch).
    Rationale: at T=102 the candidate-major layout wastes 26/128 lanes of
    every vreg (~20% of VPU issue), while time-major wastes only 2/104
    sublanes and fills all 128 lanes at tile=128; the time-axis coupling
    becomes sublane rolls.

    per_cand_world (analytic + time_major only): every CANDIDATE carries its
    own world primitives — sphere/box parameter rows become [S, 4|6, tile]
    VMEM blocks (lane = candidate) instead of shared SMEM scalars, and the
    distance math broadcasts [1, tile] rows against the [T, tile] fields.
    This is what lets the batched MPC loop (per-scenario moving obstacles,
    SURVEY config 5) share the flat scenarios×candidates layout of
    solver.solve_batch instead of paying per-scenario tile padding.

    ee_out (analytic + time_major only): emit a third output `ee
    [12, T, C]` — the end-effector frame per waypoint per candidate (rows
    0–2 world position of the LAST joint origin, rows 3–11 its rotation,
    row-major), already live in registers when the joint loop finishes.
    This is what lets Cartesian constraint costs (A.6, the paper's "glass
    of water") ride the fused time-major path: the constraint tail becomes
    ~40 elementwise XLA flops per waypoint on a [T, B·C] tensor instead of
    a second vmapped FK sweep re-running the chain the kernel just
    computed (solver._tm_step_eligible; VERDICT r4 item 3c).

    with_activity (analytic + time_major only): the call takes one extra
    SMEM vector `tile_active [n_tiles] int32`; a tile whose flag is 0 skips
    ALL compute and writes zero cost/margin rows. This is the sync-free
    answer to the convergence tail of `solver.solve_batch` (BASELINE
    config 4): the batched while_loop runs until every scenario is done, so
    finished scenarios' candidates would otherwise keep paying full FK+SDF
    every iteration; the caller derives per-tile flags from the done mask
    and the kernel drops those tiles inside the single dispatch — no host
    round trip, composes with jit/sharding/MPC. Skipped rows' outputs are
    zeros (never NaN), and the solver's freeze mask discards them anyway.
    """
    if mode == "analytic":
        d, n_bodies, n_spheres, n_boxes, T = shapes
    else:
        d, n_bodies, T = shapes
        n_spheres = n_boxes = 0
        assert not time_major, "time_major implemented for analytic mode"
    if per_cand_world:
        assert mode == "analytic" and time_major, \
            "per-candidate worlds need the analytic time-major kernel"
    if with_activity:
        assert mode == "analytic" and time_major, \
            "tile-activity skip is implemented for the analytic time-major kernel"
    if ee_out:
        assert mode == "analytic" and time_major, \
            "ee_out is implemented for the analytic time-major kernel"
    tile = tile_c or (128 if time_major else TILE_C)
    offsets = [0]
    for c in body_counts:
        offsets.append(offsets[-1] + c)
    assert offsets[-1] == n_bodies, (body_counts, n_bodies)

    def kernel(*refs):
        if mode == "analytic":
            if with_activity:
                act_ref = refs[0]
                refs = refs[1:]
            ee_ref = refs[-1] if ee_out else None
            (type_ref, axis_ref, off_ref, rotf_ref, base_ref, boff_ref,
             brad_ref, sph_ref, box_ref, cand_ref, q_obs_ref,
             margin_ref) = refs[:12]
        else:
            (type_ref, axis_ref, off_ref, rotf_ref, base_ref, boff_ref,
             cand_ref, kin_ref) = refs
        if with_activity:
            flag = act_ref[pl.program_id(0)]

            @pl.when(flag == 0)
            def _skip():
                zero = jnp.zeros((T, tile), jnp.float32)
                q_obs_ref[:, :] = zero
                margin_ref[:, :] = zero
                if ee_out:
                    for k in range(12):
                        ee_ref[k, :, :] = zero

            @pl.when(flag != 0)
            def _run():
                _kernel_body(*refs)
            return
        _kernel_body(*refs)

    def _kernel_body(*refs):
        if mode == "analytic":
            ee_ref = refs[-1] if ee_out else None
            (type_ref, axis_ref, off_ref, rotf_ref, base_ref, boff_ref,
             brad_ref, sph_ref, box_ref, cand_ref, q_obs_ref,
             margin_ref) = refs[:12]
        else:
            (type_ref, axis_ref, off_ref, rotf_ref, base_ref, boff_ref,
             cand_ref, kin_ref) = refs
        inv2dt = 1.0 / (2.0 * dt)
        if time_major:
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, tile), 0)
        else:
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, T), 1)
        t_axis = 0 if time_major else 1
        mzero = cand_ref[0, :, :] * 0.0

        p0 = mzero + base_ref[9]
        p1 = mzero + base_ref[10]
        p2 = mzero + base_ref[11]
        R = tuple(mzero + base_ref[k] for k in range(9))
        q_obs = mzero
        margin = mzero + 1e6

        def _cmul(k, expr):
            """k·expr with exact 0/±1 folding; None encodes exact zero."""
            if k == 0.0:
                return None
            if k == 1.0:
                return expr
            if k == -1.0:
                return -expr
            return k * expr

        def _csum(terms):
            terms = [t for t in terms if t is not None]
            if not terms:
                return None
            out = terms[0]
            for t in terms[1:]:
                out = out + t
            return out

        for j in range(d):                    # UNROLLED joint loop
            o0, o1, o2 = off_ref[j, 0], off_ref[j, 1], off_ref[j, 2]
            p0 = p0 + R[0] * o0 + R[1] * o1 + R[2] * o2
            p1 = p1 + R[3] * o0 + R[4] * o1 + R[5] * o2
            p2 = p2 + R[6] * o0 + R[7] * o1 + R[8] * o2
            if not skip_rotf:
                F = [rotf_ref[j, k] for k in range(9)]
                R = tuple(R[3 * i + 0] * F[0 + c] + R[3 * i + 1] * F[3 + c]
                          + R[3 * i + 2] * F[6 + c]
                          for i in range(3) for c in range(3))
            qj = cand_ref[j, :, :]
            if static_joints is not None:
                # trace-time specialization: type and axis are Python
                # constants; 0/±1 components fold out (exact — see
                # builder docstring)
                jt, ax, ay, az = static_joints[j]
                if jt != 0:                       # prismatic: translate only
                    aw = [_csum([_cmul(ax, R[3 * i + 0]),
                                 _cmul(ay, R[3 * i + 1]),
                                 _cmul(az, R[3 * i + 2])])
                          for i in range(3)]
                    if aw[0] is not None:
                        p0 = p0 + aw[0] * qj
                    if aw[1] is not None:
                        p1 = p1 + aw[1] * qj
                    if aw[2] is not None:
                        p2 = p2 + aw[2] * qj
                    # rotation unchanged (G = I); fall through to bodies
                else:
                    s, c = jnp.sin(qj), jnp.cos(qj)
                    oc = 1.0 - c

                    def _g(diag, k_oc, k_s):
                        return _csum([c if diag else None, _cmul(k_oc, oc),
                                      _cmul(k_s, s)])

                    G = (_g(True, ax * ax, 0.0), _g(False, ax * ay, -az),
                         _g(False, ax * az, ay),
                         _g(False, ay * ax, az), _g(True, ay * ay, 0.0),
                         _g(False, ay * az, -ax),
                         _g(False, az * ax, -ay), _g(False, az * ay, ax),
                         _g(True, az * az, 0.0))
                    R = tuple(
                        _csum([None if G[3 * k + cc] is None
                               else R[3 * i + k] * G[3 * k + cc]
                               for k in range(3)])
                        for i in range(3) for cc in range(3))
            else:
                x, y, z = axis_ref[j, 0], axis_ref[j, 1], axis_ref[j, 2]
                rev = jnp.where(type_ref[j] == 0, 1.0, 0.0)
                aw0 = R[0] * x + R[1] * y + R[2] * z
                aw1 = R[3] * x + R[4] * y + R[5] * z
                aw2 = R[6] * x + R[7] * y + R[8] * z
                tq = (1.0 - rev) * qj
                p0 = p0 + aw0 * tq
                p1 = p1 + aw1 * tq
                p2 = p2 + aw2 * tq
                s, c = jnp.sin(qj), jnp.cos(qj)
                oc = 1.0 - c
                G = (c + x * x * oc, x * y * oc - z * s, x * z * oc + y * s,
                     y * x * oc + z * s, c + y * y * oc, y * z * oc - x * s,
                     z * x * oc - y * s, z * y * oc + x * s, c + z * z * oc)
                eye = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
                G = tuple(rev * g + (1.0 - rev) * e for g, e in zip(G, eye))
                R = tuple(R[3 * i + 0] * G[0 + cc] + R[3 * i + 1] * G[3 + cc]
                          + R[3 * i + 2] * G[6 + cc]
                          for i in range(3) for cc in range(3))

            for b in range(offsets[j], offsets[j + 1]):   # this link's bodies
                bo0, bo1, bo2 = (boff_ref[b, 0], boff_ref[b, 1],
                                 boff_ref[b, 2])
                bx0 = p0 + R[0] * bo0 + R[1] * bo1 + R[2] * bo2
                bx1 = p1 + R[3] * bo0 + R[4] * bo1 + R[5] * bo2
                bx2 = p2 + R[6] * bo0 + R[7] * bo1 + R[8] * bo2
                bx = (bx0, bx1, bx2)
                speed = _workspace_speed(bx, t_idx, T, inv2dt, mzero,
                                         axis=t_axis)
                if mode == "kin":
                    kin_ref[b, 0, :, :] = bx0
                    kin_ref[b, 1, :, :] = bx1
                    kin_ref[b, 2, :, :] = bx2
                    kin_ref[b, 3, :, :] = speed
                    continue
                dist = mzero + 1e6

                if per_cand_world:
                    # [1, tile] parameter rows (lane = candidate) broadcast
                    # against the [T, tile] position fields
                    def sphere_fn(sidx, dist):
                        r0 = bx0 - sph_ref[sidx, 0:1, :]
                        r1 = bx1 - sph_ref[sidx, 1:2, :]
                        r2 = bx2 - sph_ref[sidx, 2:3, :]
                        ds = (jnp.sqrt(r0 * r0 + r1 * r1 + r2 * r2)
                              - sph_ref[sidx, 3:4, :])
                        return jnp.minimum(dist, ds)

                    def box_fn(bidx, dist):
                        q0 = (jnp.abs(bx0 - box_ref[bidx, 0:1, :])
                              - box_ref[bidx, 3:4, :])
                        q1 = (jnp.abs(bx1 - box_ref[bidx, 1:2, :])
                              - box_ref[bidx, 4:5, :])
                        q2 = (jnp.abs(bx2 - box_ref[bidx, 2:3, :])
                              - box_ref[bidx, 5:6, :])
                        w0 = jnp.maximum(q0, 0.0)
                        w1 = jnp.maximum(q1, 0.0)
                        w2 = jnp.maximum(q2, 0.0)
                        outside = jnp.sqrt(w0 * w0 + w1 * w1 + w2 * w2)
                        inside = jnp.minimum(
                            jnp.maximum(jnp.maximum(q0, q1), q2), 0.0)
                        return jnp.minimum(dist, outside + inside)
                else:
                    def sphere_fn(sidx, dist):
                        r0 = bx0 - sph_ref[sidx, 0]
                        r1 = bx1 - sph_ref[sidx, 1]
                        r2 = bx2 - sph_ref[sidx, 2]
                        ds = (jnp.sqrt(r0 * r0 + r1 * r1 + r2 * r2)
                              - sph_ref[sidx, 3])
                        return jnp.minimum(dist, ds)

                    def box_fn(bidx, dist):
                        q0 = jnp.abs(bx0 - box_ref[bidx, 0]) - box_ref[bidx, 3]
                        q1 = jnp.abs(bx1 - box_ref[bidx, 1]) - box_ref[bidx, 4]
                        q2 = jnp.abs(bx2 - box_ref[bidx, 2]) - box_ref[bidx, 5]
                        w0 = jnp.maximum(q0, 0.0)
                        w1 = jnp.maximum(q1, 0.0)
                        w2 = jnp.maximum(q2, 0.0)
                        outside = jnp.sqrt(w0 * w0 + w1 * w1 + w2 * w2)
                        inside = jnp.minimum(
                            jnp.maximum(jnp.maximum(q0, q1), q2), 0.0)
                        return jnp.minimum(dist, outside + inside)

                if n_spheres:
                    dist = jax.lax.fori_loop(0, n_spheres, sphere_fn, dist)
                if n_boxes:
                    dist = jax.lax.fori_loop(0, n_boxes, box_fn, dist)
                d_sig = dist - brad_ref[b] - clearance
                pot = jnp.where(
                    d_sig < 0.0, -d_sig + 0.5 * clearance,
                    jnp.where(d_sig <= clearance,
                              (d_sig - clearance) ** 2 / (2.0 * clearance),
                              0.0))
                q_obs = q_obs + pot * speed
                margin = jnp.minimum(margin, dist - brad_ref[b])

        if mode == "analytic":
            q_obs_ref[:, :] = q_obs * dt
            margin_ref[:, :] = margin
            if ee_out:
                # (p, R) after the last loop iteration ARE the EE frame —
                # free to emit, they are already in registers. Under
                # static-joint specialization an R entry can be the exact-
                # zero sentinel (None); emit literal zeros for those.
                ee_ref[0, :, :] = p0
                ee_ref[1, :, :] = p1
                ee_ref[2, :, :] = p2
                for k in range(9):
                    ee_ref[3 + k, :, :] = (mzero if R[k] is None
                                           else R[k] + mzero)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32

    def fn(cand_full: jnp.ndarray, robot, world=None, tile_active=None):
        C = cand_full.shape[0]
        assert C % tile == 0, f"pad candidate count to {tile} (got {C})"
        assert (tile_active is not None) == with_activity
        base = jnp.concatenate([robot.base_rot.reshape(9),
                                robot.base_pos.reshape(3)]).astype(f32)
        if time_major:
            cand_jm = jnp.transpose(cand_full.astype(f32), (2, 1, 0))
        else:
            cand_jm = jnp.transpose(cand_full.astype(f32), (2, 0, 1))
        common = (robot.joint_type.astype(jnp.int32),
                  robot.joint_axis.astype(f32),
                  robot.joint_offset.astype(f32),
                  robot.joint_rot.reshape(d, 9).astype(f32), base,
                  robot.body_offset.astype(f32))
        if mode == "analytic":
            if per_cand_world:
                # [C, S, 3]+[C, S] world leaves -> [S, 4, C] lane rows
                sph = jnp.transpose(jnp.concatenate(
                    [world.sphere_center, world.sphere_radius[..., None]],
                    axis=-1), (1, 2, 0)).astype(f32)
                box = jnp.transpose(jnp.concatenate(
                    [world.box_center, world.box_half], axis=-1),
                    (1, 2, 0)).astype(f32)
                world_specs = [
                    pl.BlockSpec((n_spheres, 4, tile), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_boxes, 6, tile), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)]
            else:
                sph = jnp.concatenate(
                    [world.sphere_center.reshape(-1, 3),
                     world.sphere_radius.reshape(-1, 1)], axis=1).astype(f32)
                box = jnp.concatenate(
                    [world.box_center.reshape(-1, 3),
                     world.box_half.reshape(-1, 3)], axis=1).astype(f32)
                world_specs = [smem, smem]
            if time_major:
                act_specs, act_args = [], ()
                if with_activity:
                    act_specs = [smem]
                    act_args = (tile_active.astype(jnp.int32),)
                out_specs = [
                    pl.BlockSpec((T, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)]
                out_shape = [jax.ShapeDtypeStruct((T, C), f32),
                             jax.ShapeDtypeStruct((T, C), f32)]
                if ee_out:
                    out_specs.append(
                        pl.BlockSpec((12, T, tile), lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM))
                    out_shape.append(jax.ShapeDtypeStruct((12, T, C), f32))
                outs = pl.pallas_call(
                    kernel,
                    grid=(C // tile,),
                    in_specs=act_specs + [smem] * 7 + world_specs + [
                        pl.BlockSpec((d, T, tile), lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM)],
                    out_specs=out_specs,
                    out_shape=out_shape,
                    interpret=interpret,
                )(*act_args, *common, robot.body_radius.astype(f32), sph, box,
                  cand_jm)
                if ee_out:
                    return outs[0].T, outs[1].T, outs[2]
                return outs[0].T, outs[1].T
            return pl.pallas_call(
                kernel,
                grid=(C // tile,),
                in_specs=[smem] * 9 + [
                    pl.BlockSpec((d, tile, T), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=[
                    pl.BlockSpec((tile, T), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, T), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)],
                out_shape=[jax.ShapeDtypeStruct((C, T), f32),
                           jax.ShapeDtypeStruct((C, T), f32)],
                interpret=interpret,
            )(*common, robot.body_radius.astype(f32), sph, box, cand_jm)
        return pl.pallas_call(
            kernel,
            grid=(C // tile,),
            in_specs=[smem] * 6 + [
                pl.BlockSpec((d, tile, T), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_bodies, 4, tile, T),
                                   lambda i: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_bodies, 4, C, T), f32),
            interpret=interpret,
        )(*common, cand_jm)

    return fn


def _tile_flags(row_active, C: int, tile: int):
    """[C] bool row-activity -> [n_tiles] int32 per-tile flags (pad = off)."""
    if row_active is None:
        return None
    pad = (-C) % tile
    if pad:
        row_active = jnp.concatenate(
            [row_active, jnp.zeros((pad,), row_active.dtype)])
    return jnp.any(row_active.reshape(-1, tile), axis=1).astype(jnp.int32)


# Above this many (body, candidate, timestep) samples the grid tail scans
# over the body axis instead of one vectorized gather: the packed-table
# gather otherwise materializes a [samples, 8] intermediate (and XLA's
# fusion buffering multiplies it) — B=1024 config-4 shape = 70M samples
# = 2.2 GB per copy, observed OOM at 36 GB requested. Scanning bodies caps
# the live intermediate at samples/n_bodies while issuing the same total
# index count (the gather is per-index issue-bound, so wall time is flat).
_GRID_SCAN_THRESHOLD = 8_000_000


def _grid_finish(world, kin, dt: float, clearance: float, body_radius):
    """XLA tail of the hybrid grid path: trilinear SDF → potential → reduce.

    kin: [B, 4, C, T] from the kinematics kernel. Returns
    (q_obs [C, T], margin_row [C, T]). Matches costs/obstacle.py numerics.
    Accepts GridSDF or CompositeWorld (sdf() min-composes the overlay).
    """
    from tpustomp.world.sdf import CompositeWorld, sdf

    pos = jnp.moveaxis(kin[:, :3], 1, -1)            # [B, C, T, 3]
    speed = kin[:, 3]                                # [B, C, T]
    per_cand = (isinstance(world, CompositeWorld)
                and world.overlay.sphere_center.ndim == 3)

    def dist_of(p, cand_axis):
        """signed distance of p ([..., C, T, 3] with the candidate axis at
        `cand_axis`) under the possibly per-candidate world."""
        if per_cand:
            d_grid = sdf(world.grid, p)
            d_ov = jax.vmap(sdf, in_axes=(0, cand_axis),
                            out_axes=cand_axis)(world.overlay, p)
            return jnp.minimum(d_grid, d_ov)
        return sdf(world, p)

    n_samples = pos.shape[0] * pos.shape[1] * pos.shape[2]
    if n_samples > _GRID_SCAN_THRESHOLD:
        CT = pos.shape[1:3]

        def step(carry, inp):
            q_acc, m_acc = carry
            p_b, s_b, r_b = inp                      # [C, T, 3], [C, T], []
            dist = dist_of(p_b, 0)                   # [C, T]
            d_sig = dist - r_b - clearance
            pot = jnp.where(
                d_sig < 0.0, -d_sig + 0.5 * clearance,
                jnp.where(d_sig <= clearance,
                          (d_sig - clearance) ** 2 / (2.0 * clearance),
                          0.0))
            return (q_acc + pot * s_b,
                    jnp.minimum(m_acc, dist - r_b)), None

        init = (jnp.zeros(CT, pos.dtype), jnp.full(CT, jnp.inf, pos.dtype))
        (q_sum, margin_row), _ = jax.lax.scan(
            step, init, (pos, speed, body_radius))
        return q_sum * dt, margin_row

    dist = dist_of(pos, 1)                           # [B, C, T]
    radius = body_radius[:, None, None]
    d_sig = dist - radius - clearance
    pot = jnp.where(
        d_sig < 0.0, -d_sig + 0.5 * clearance,
        jnp.where(d_sig <= clearance,
                  (d_sig - clearance) ** 2 / (2.0 * clearance), 0.0))
    q_obs = jnp.sum(pot * speed, axis=0) * dt        # [C, T]
    margin_row = jnp.min(dist - radius, axis=0)      # [C, T]
    return q_obs, margin_row


def _check_joint_static(robot):
    """Drop a stale joint_static (and warn) if it contradicts the runtime
    joint arrays. Guards `dataclasses.replace(robot, joint_type=...)` /
    `joint_axis=...` without a matching joint_static update — the
    specialized kernel would silently compute the OLD kinematics. Only
    checkable in eager mode (under jit the leaves are tracers; RobotSpec
    constructors keep the two consistent, so jit-traced robots built via
    model._spec are safe by construction)."""
    import numpy as np

    sj = getattr(robot, "joint_static", None)
    if sj is None or isinstance(robot.joint_axis, jax.core.Tracer):
        return robot
    types = [int(t) for t, _, _, _ in sj]
    axes = [[a, b, c] for _, a, b, c in sj]
    if (np.array_equal(np.asarray(robot.joint_type), types)
            and np.array_equal(np.asarray(robot.joint_axis),
                               np.asarray(axes, np.float32))):
        return robot
    import warnings

    warnings.warn(
        "RobotSpec.joint_static disagrees with joint_type/joint_axis "
        "(stale dataclasses.replace?); disabling kernel FK specialization "
        "for this call", stacklevel=3)
    return robot.replace(joint_static=None)


def obstacle_cost_batch_pallas(robot, world, full_trajs: jnp.ndarray,
                               dt: float, clearance: float,
                               interpret: bool = False, tile_c=None,
                               row_active=None, want_ee: bool = False):
    """Batched obstacle cost via the fused kernels, with transparent padding.

    full_trajs: [C, T, d] -> (q_obs [C, T], margin [C]). Shapes are read from
    the (possibly traced) arrays; values stay traced. Analytic worlds run
    fully fused; grid and composite (grid+overlay) worlds run the hybrid
    kinematics kernel + XLA gather/min-compose tail.

    row_active: optional [C] bool — rows whose flag is False may return
    ZEROS instead of their true cost/margin (the caller promises to discard
    them; solver.solve_batch passes the not-done mask so finished scenarios
    stop paying kernel time inside the while_loop). Implemented as a
    per-tile skip on the time-major analytic kernels; other paths ignore
    the hint and compute everything (correct either way).

    want_ee=True additionally returns the per-waypoint end-effector frame
    `ee [12, T, C]` (kernel ee_out; unpadded candidate columns) — only
    supported where the unrolled analytic time-major kernel runs (shared
    or per-candidate analytic world, robot with body_counts, default
    layout); asserted otherwise. Fused-path constraint costs consume it
    (costs/constraints.constraint_cost_tm).

    PER-CANDIDATE WORLDS: analytic/overlay leaves may carry a leading
    candidate axis (sphere_center [C, S, 3] instead of [S, 3]) — every
    candidate is evaluated against its own primitives. This is the flat
    execution form of "one world per scenario" (batched MPC with moving
    obstacles): solver.solve_batch repeats each scenario's world across its
    candidates before flattening. Analytic per-candidate worlds need the
    unrolled time-major kernel (per_cand_world=True).
    """
    from tpustomp.world.sdf import CompositeWorld, GridSDF

    C, T, d = full_trajs.shape
    tile = tile_c or TILE_C
    pad = (-C) % tile

    def _pad_cand_axis(x, n):
        # pad-with-row-0: pads duplicate a real candidate so kernel math
        # needs no masking; the single source of this semantic (the tm
        # branch re-pads to its own tile via the same helper)
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (n,) + x.shape[1:])], axis=0) \
            if n else x

    padded = _pad_cand_axis(full_trajs, pad)

    # static body partition available (RobotSpec link-sorts at construction)
    # -> scratch-free unrolled kernel; else the rolled/staged fallback
    unrolled = getattr(robot, "body_counts", None) is not None
    robot = _check_joint_static(robot)

    if isinstance(world, (GridSDF, CompositeWorld)):
        assert not want_ee, "want_ee needs the analytic time-major kernel"
        if (isinstance(world, CompositeWorld)
                and world.overlay.sphere_center.ndim == 3):
            world = CompositeWorld(
                grid=world.grid,
                overlay=jax.tree.map(lambda x: _pad_cand_axis(x, pad),
                                     world.overlay))
        if unrolled:
            shapes = (d, robot.body_link.shape[0], T)
            fn = build_unrolled_kernel(shapes, dt, clearance,
                                       robot.body_counts, mode="kin",
                                       interpret=interpret, tile_c=tile,
                                       skip_rotf=robot.rot_fixed_identity,
                                       static_joints=getattr(
                                           robot, "joint_static", None))
            kin = fn(padded, robot)
        else:
            shapes = (d, robot.body_link.shape[0], T)
            fn = build_kinematics_kernel(shapes, dt, interpret=interpret,
                                         tile_c=tile,
                                         skip_rotf=robot.rot_fixed_identity)
            kin = fn(padded, robot)
        q_obs, margin_row = _grid_finish(world, kin, dt, clearance,
                                         robot.body_radius.astype(jnp.float32))
        return q_obs[:C], jnp.min(margin_row[:C], axis=1)

    per_cand = world.sphere_center.ndim == 3
    if per_cand:
        assert unrolled, ("per-candidate analytic worlds need the unrolled "
                          "time-major kernel (robot lacks body_counts)")
        # per-candidate empty-set sentinels, then pad the candidate axis
        if world.sphere_radius.shape[-1] == 0:
            world = world.replace(
                sphere_center=jnp.full((C, 1, 3), 1e6, jnp.float32),
                sphere_radius=jnp.zeros((C, 1), jnp.float32))
        if world.box_half.shape[-1] == 0 or world.box_half.shape[-2] == 0:
            world = world.replace(
                box_center=jnp.full((C, 1, 3), 1e6, jnp.float32),
                box_half=jnp.full((C, 1, 3), 1e-3, jnp.float32))
        tm_tile = 128 if tile_c is None else tile
        tm_pad = (-C) % tm_tile
        padded_tm = _pad_cand_axis(full_trajs, tm_pad)
        world = jax.tree.map(lambda x: _pad_cand_axis(x, tm_pad), world)
        shapes = (d, robot.body_link.shape[0],
                  world.sphere_radius.shape[-1], world.box_half.shape[-2], T)
        flags = _tile_flags(row_active, C, tm_tile)
        fn = build_unrolled_kernel(shapes, dt, clearance, robot.body_counts,
                                   mode="analytic", interpret=interpret,
                                   tile_c=tm_tile, time_major=True,
                                   per_cand_world=True,
                                   skip_rotf=robot.rot_fixed_identity,
                                   with_activity=flags is not None,
                                   static_joints=getattr(
                                       robot, "joint_static", None),
                                   ee_out=want_ee)
        outs = fn(padded_tm, robot, world, tile_active=flags)
        if want_ee:
            q_obs, margin_row, ee = outs
            return (q_obs[:C], jnp.min(margin_row[:C], axis=1),
                    ee[:, :, :C])
        q_obs, margin_row = outs
        return q_obs[:C], jnp.min(margin_row[:C], axis=1)

    # zero-length SMEM operands break Mosaic layout verification; pad empty
    # primitive sets with one far-away sentinel (min() ignores it)
    if world.sphere_radius.shape[0] == 0:
        world = world.replace(
            sphere_center=jnp.full((1, 3), 1e6, jnp.float32),
            sphere_radius=jnp.zeros((1,), jnp.float32))
    if world.box_half.shape[0] == 0:
        world = world.replace(
            box_center=jnp.full((1, 3), 1e6, jnp.float32),
            box_half=jnp.full((1, 3), 1e-3, jnp.float32))
    shapes = (d, robot.body_link.shape[0], world.sphere_radius.shape[0],
              world.box_half.shape[0], T)
    import os
    layout = os.environ.get("TPUSTOMP_PALLAS_LAYOUT", "tm")
    if unrolled and layout == "tm":
        # time-major [T, tile] blocks: 2.46x over the candidate-major
        # default it replaced (1.26 vs 3.10 ms for 14336x102x13 on v5e,
        # bit-identical; VERDICT r1 item 10 / docs/PERFORMANCE.md) — at
        # T=102 candidate-major wastes 26/128 lanes of every vreg.
        # time-major needs tile 128 (lane axis = candidates); re-pad.
        tm_tile = 128 if tile_c is None else tile
        tm_pad = (-C) % tm_tile
        padded_tm = _pad_cand_axis(full_trajs, tm_pad)
        flags = _tile_flags(row_active, C, tm_tile)
        fn = build_unrolled_kernel(shapes, dt, clearance, robot.body_counts,
                                   mode="analytic", interpret=interpret,
                                   tile_c=tm_tile, time_major=True,
                                   skip_rotf=robot.rot_fixed_identity,
                                   with_activity=flags is not None,
                                   static_joints=getattr(
                                       robot, "joint_static", None),
                                   ee_out=want_ee)
        outs = fn(padded_tm, robot, world, tile_active=flags)
        if want_ee:
            q_obs, margin_row, ee = outs
            return (q_obs[:C], jnp.min(margin_row[:C], axis=1),
                    ee[:, :, :C])
        q_obs, margin_row = outs
        return q_obs[:C], jnp.min(margin_row[:C], axis=1)
    assert not want_ee, "want_ee needs the time-major unrolled kernel"
    if unrolled:
        fn = build_unrolled_kernel(shapes, dt, clearance, robot.body_counts,
                                   mode="analytic", interpret=interpret,
                                   tile_c=tile, time_major=False,
                                   skip_rotf=robot.rot_fixed_identity,
                                   static_joints=getattr(
                                       robot, "joint_static", None))
        q_obs, margin_row = fn(padded, robot, world)
        return q_obs[:C], jnp.min(margin_row[:C], axis=1)
    fn = build_rollout_kernel(shapes, dt, clearance, interpret=interpret,
                              tile_c=tile,
                              skip_rotf=robot.rot_fixed_identity)
    q_obs, margin_row = fn(padded, robot, world)
    return q_obs[:C], jnp.min(margin_row[:C], axis=1)
