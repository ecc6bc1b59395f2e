"""Command-line runner — the reference's node + launch-file analogue.

Reference equivalent (SURVEY §2 L7): `stomp_planner_node` launched with a
YAML param file, serving GetMotionPlan. Here:

    python -m tpustomp configs/config2_tabletop.yaml [--mode chomp]
        [--seed 0] [--viz] [--grid]

reads a config file containing `planner:` (PlannerConfig fields) and
`scene:` (robot, primitives, q0/qN), runs one plan, and prints a JSON result
line. `--grid` voxelizes the scene through the signed-EDT pipeline instead
of the analytic SDF.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _build_scene(scene: dict, use_grid: bool):
    from tpustomp.robot import model
    from tpustomp.world import edt
    from tpustomp.world.sdf import AnalyticWorld

    robot_name = scene.get("robot", "arm_7dof")
    kwargs = {}
    if "body_radius" in scene:
        kwargs["body_radius"] = scene["body_radius"]
    robot = getattr(model, robot_name)(**kwargs)

    spheres = [(tuple(s["center"]), float(s["radius"]))
               for s in scene.get("spheres", [])]
    boxes = [(tuple(b["center"]), tuple(b["half"]))
             for b in scene.get("boxes", [])]
    world = AnalyticWorld.make(spheres=spheres, boxes=boxes)
    if use_grid:
        g = scene.get("grid")
        if g is None:
            raise SystemExit("--grid requested but scene has no grid: spec")
        occ = edt.occupancy_from_analytic(world, tuple(g["origin"]),
                                          tuple(g["shape"]),
                                          float(g["resolution"]))
        world = edt.signed_edt(occ, float(g["resolution"]),
                               tuple(g["origin"]))
    q0 = np.asarray(scene["q0"], np.float32)
    qN = np.asarray(scene["qN"], np.float32)
    return robot, world, q0, qN


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpustomp",
                                description="TPU-native STOMP/CHOMP planner")
    p.add_argument("config", help="YAML file with planner: and scene:")
    p.add_argument("--mode", choices=["stomp", "chomp"], default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--viz", action="store_true",
                   help="dump trajectory/metrics figures (tpustomp_viz/)")
    p.add_argument("--grid", action="store_true",
                   help="use the voxel signed-EDT world instead of analytic")
    p.add_argument("--timed", action="store_true",
                   help="enforce planning_time_limit (plan_timed)")
    args = p.parse_args(argv)

    import yaml
    import jax

    from tpustomp.api.config import from_dict
    from tpustomp.api.plan import plan, plan_timed
    from tpustomp.api.problem import ProblemSpec

    with open(args.config) as f:
        doc = yaml.safe_load(f)
    cfg = from_dict(doc.get("planner", {}))
    if args.mode:
        cfg = cfg.replace(mode=args.mode)
    if args.viz:
        cfg = cfg.replace(animate_path=True)
    robot, world, q0, qN = _build_scene(doc["scene"], args.grid)

    t0 = time.perf_counter()
    runner = plan_timed if args.timed else plan
    sol = runner(robot, world, ProblemSpec(q0=q0, qN=qN), cfg,
                 key=jax.random.PRNGKey(args.seed))
    wall = time.perf_counter() - t0
    out = {
        "success": bool(sol.success),
        "iterations": int(sol.iterations),
        "cost": float(sol.cost),
        "wall_seconds": round(wall, 3),
        "num_waypoints": int(sol.trajectory.shape[0]),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return 0 if out["success"] else 1


if __name__ == "__main__":
    sys.exit(main())
