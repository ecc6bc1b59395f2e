"""On-TPU compiled-kernel parity gate (VERDICT round-1 item 3).

CPU tests run the Pallas kernels in interpret mode only; Mosaic-compiled
code is a different backend and could silently diverge. This gate runs every
kernel variant COMPILED on the chip against the XLA reference path on the
same candidate batch and records max|Δ|:

  - analytic world, unrolled kernel   (time-major lane-packed default)
  - analytic world, rolled kernel     (body_counts=None fallback)
  - grid world, hybrid kin kernel + XLA trilinear tail
  - composite world (grid + analytic overlay), hybrid kernel + min tail

Returns a dict for BENCH_DETAILS.json; call only when
jax.default_backend() == "tpu" (bench.py auto-skips elsewhere).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench.common import config2_cfg, config2_scene, log  # noqa: E402


def _xla_reference(robot, world, fulls, dt, clearance):
    from tpustomp.costs.obstacle import obstacle_cost

    q_obs, margin = jax.jit(jax.vmap(
        lambda f: obstacle_cost(robot, world, f, dt, clearance)))(fulls)
    return np.asarray(q_obs), np.asarray(margin)


def _pallas(robot, world, fulls, dt, clearance):
    from tpustomp.kernels.rollout_pallas import obstacle_cost_batch_pallas

    q_obs, margin = jax.jit(
        lambda f: obstacle_cost_batch_pallas(robot, world, f, dt, clearance)
    )(fulls)
    return np.asarray(q_obs), np.asarray(margin)


def run(C=128, T=102, seed=0):
    from tpustomp.world.edt import grid_from_analytic

    robot, world, q0, qN = config2_scene()
    cfg = config2_cfg()
    dt, clearance = cfg.dt, cfg.collision_clearance
    rng = np.random.default_rng(seed)
    base = np.linspace(q0, qN, T, dtype=np.float32)          # [T, d]
    fulls = jnp.asarray(base[None] + rng.normal(0, 0.1, (C, T, 7))
                        .astype(np.float32))

    ref_q, ref_m = _xla_reference(robot, world, fulls, dt, clearance)
    scale_q = max(float(np.abs(ref_q).max()), 1e-6)

    out = {}
    variants = {
        "analytic_unrolled": (robot, world),
        "analytic_rolled": (robot.replace(body_counts=None), world),
    }
    res = 0.025
    origin = (-0.6, -1.2, -0.4)
    shape = (int(2.2 / res), int(2.4 / res), int(1.8 / res))
    grid = grid_from_analytic(world, origin, shape, resolution=res)
    grid_ref_q, grid_ref_m = _xla_reference(robot, grid, fulls, dt, clearance)
    for name, (rb, wd) in variants.items():
        q, m = _pallas(rb, wd, fulls, dt, clearance)
        out[name] = {
            "max_abs_dq": float(np.abs(q - ref_q).max()),
            "max_rel_dq": float(np.abs(q - ref_q).max() / scale_q),
            "max_abs_dmargin": float(np.abs(m - ref_m).max()),
        }
        log(f"parity {name}: {out[name]}")
    q, m = _pallas(robot, grid, fulls, dt, clearance)
    out["grid_hybrid"] = {
        "max_abs_dq": float(np.abs(q - grid_ref_q).max()),
        "max_rel_dq": float(np.abs(q - grid_ref_q).max()
                            / max(float(np.abs(grid_ref_q).max()), 1e-6)),
        "max_abs_dmargin": float(np.abs(m - grid_ref_m).max()),
    }
    log(f"parity grid_hybrid: {out['grid_hybrid']}")
    from tpustomp.world.sdf import CompositeWorld
    comp = CompositeWorld.make(grid, spheres=[((0.35, 0.3, 0.55), 0.12)])
    comp_ref_q, comp_ref_m = _xla_reference(robot, comp, fulls, dt, clearance)
    q, m = _pallas(robot, comp, fulls, dt, clearance)
    out["composite_hybrid"] = {
        "max_abs_dq": float(np.abs(q - comp_ref_q).max()),
        "max_rel_dq": float(np.abs(q - comp_ref_q).max()
                            / max(float(np.abs(comp_ref_q).max()), 1e-6)),
        "max_abs_dmargin": float(np.abs(m - comp_ref_m).max()),
    }
    log(f"parity composite_hybrid: {out['composite_hybrid']}")
    # per-candidate worlds (batched-MPC form): every candidate carries its
    # own primitives; reference = XLA per candidate with that world
    from tpustomp.costs.obstacle import obstacle_cost
    from tpustomp.world.sdf import AnalyticWorld
    centers = jnp.asarray(rng.uniform(-0.6, 0.8, (C, 2, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.05, 0.3, (C, 2)), jnp.float32)
    wpc = AnalyticWorld(
        sphere_center=centers, sphere_radius=radii,
        box_center=jnp.broadcast_to(world.box_center, (C,) + world.box_center.shape),
        box_half=jnp.broadcast_to(world.box_half, (C,) + world.box_half.shape))
    pc_ref_q, pc_ref_m = jax.jit(jax.vmap(
        lambda f, w: obstacle_cost(robot, w, f, dt, clearance)
    ))(fulls, wpc)
    q, m = _pallas(robot, wpc, fulls, dt, clearance)
    pc_ref_q, pc_ref_m = np.asarray(pc_ref_q), np.asarray(pc_ref_m)
    out["analytic_per_candidate_world"] = {
        "max_abs_dq": float(np.abs(q - pc_ref_q).max()),
        "max_rel_dq": float(np.abs(q - pc_ref_q).max()
                            / max(float(np.abs(pc_ref_q).max()), 1e-6)),
        "max_abs_dmargin": float(np.abs(m - pc_ref_m).max()),
    }
    log(f"parity analytic_per_candidate_world: "
        f"{out['analytic_per_candidate_world']}")
    # prismatic chain (RPR, non-identity fixed rotations): gates the
    # specialized prismatic branch of the unrolled kernel (static_joints
    # folds the joint type at trace time) on real hardware
    from tpustomp.robot import model
    from tpustomp.robot.fk import rodrigues

    rots = np.stack([
        np.asarray(rodrigues(jnp.asarray([0.0, 0.0, 1.0]), jnp.float32(a)))
        for a in (0.3, -0.5, 0.2)])
    rpr = model._spec(
        joint_axis=[[0, 0, 1], [1, 0, 0], [0, 1, 0]],
        joint_offset=[[0, 0, 0.3], [0.4, 0, 0], [0.3, 0, 0]],
        joint_rot=rots,
        lower=[-3.0, 0.0, -3.0], upper=[3.0, 0.6, 3.0],
        limited=[True, True, True],
        joint_type=[model.REVOLUTE, model.PRISMATIC, model.REVOLUTE],
        body_link=[0, 1, 2, 2],
        body_offset=[[0.2, 0, 0], [0.1, 0, 0], [0.15, 0, 0], [0.3, 0, 0]],
        body_radius=[0.06, 0.05, 0.05, 0.04])
    wp = AnalyticWorld.make(
        spheres=[((0.5, 0.1, 0.4), 0.15)],
        boxes=[((0.2, -0.3, 0.2), (0.2, 0.1, 0.2))])
    fulls3 = jnp.asarray(
        rng.uniform([-1.0, 0.05, -1.0], [1.0, 0.55, 1.0],
                    (C, T, 3)).astype(np.float32))
    p_ref_q, p_ref_m = _xla_reference(rpr, wp, fulls3, dt, clearance)
    q, m = _pallas(rpr, wp, fulls3, dt, clearance)
    out["analytic_prismatic_rpr"] = {
        "max_abs_dq": float(np.abs(q - p_ref_q).max()),
        "max_rel_dq": float(np.abs(q - p_ref_q).max()
                            / max(float(np.abs(p_ref_q).max()), 1e-6)),
        "max_abs_dmargin": float(np.abs(m - p_ref_m).max()),
    }
    log(f"parity analytic_prismatic_rpr: {out['analytic_prismatic_rpr']}")
    # EE-frame output (round 5, ee_out): the fused-path constraint tail
    # reads these rows, so the COMPILED kernel's frame must match fk_frames
    from tpustomp.kernels.rollout_pallas import obstacle_cost_batch_pallas
    from tpustomp.robot.fk import fk_frames

    q_e, m_e, ee = jax.jit(
        lambda f: obstacle_cost_batch_pallas(robot, world, f, dt, clearance,
                                             want_ee=True))(fulls)
    ref_ee = jax.jit(jax.vmap(jax.vmap(
        lambda qq: jnp.concatenate(
            [fk_frames(robot, qq)[0][-1],
             fk_frames(robot, qq)[1][-1].reshape(9)]))))(fulls)  # [C, T, 12]
    d_ee = float(np.abs(np.asarray(jnp.transpose(ee, (2, 1, 0)))
                        - np.asarray(ref_ee)).max())
    out["ee_frame_rows"] = {
        "max_abs_dq": float(np.abs(np.asarray(q_e) - ref_q).max()),
        "max_rel_dq": float(np.abs(np.asarray(q_e) - ref_q).max() / scale_q),
        "max_abs_dmargin": float(np.abs(np.asarray(m_e) - ref_m).max()),
        "max_abs_dee": d_ee,
    }
    log(f"parity ee_frame_rows: {out['ee_frame_rows']}")
    # voxel occupancy compiled to boxes (round 5, world/decompose): the
    # decomposed world must match the XLA path ON ITSELF exactly (it is a
    # different SDF from the grid by design; the accuracy contract vs the
    # grid is tested in tests/unit/test_decompose.py)
    from tpustomp.world import edt as edt_mod
    from tpustomp.world.decompose import analytic_from_occupancy

    occ = edt_mod.occupancy_from_analytic(world, origin, shape, res)
    dec = analytic_from_occupancy(occ, res, origin)
    dec_ref_q, dec_ref_m = _xla_reference(robot, dec, fulls, dt, clearance)
    q, m = _pallas(robot, dec, fulls, dt, clearance)
    out["analytic_decomposed_boxes"] = {
        "max_abs_dq": float(np.abs(q - dec_ref_q).max()),
        "max_rel_dq": float(np.abs(q - dec_ref_q).max()
                            / max(float(np.abs(dec_ref_q).max()), 1e-6)),
        "max_abs_dmargin": float(np.abs(m - dec_ref_m).max()),
    }
    log(f"parity analytic_decomposed_boxes: {out['analytic_decomposed_boxes']}")
    # fp32 reassociation tolerance: fail loudly if the compiled kernels have
    # actually diverged from the XLA semantics
    out["pass"] = all(v["max_rel_dq"] < 1e-3 and v["max_abs_dmargin"] < 1e-4
                      for k, v in out.items() if isinstance(v, dict))
    out["pass"] = bool(out["pass"]
                       and out["ee_frame_rows"]["max_abs_dee"] < 1e-4)
    return out


if __name__ == "__main__":
    import json

    print(json.dumps(run(), indent=2))
