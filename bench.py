"""Benchmark entry point (driver contract): prints ONE JSON line to stdout.

Headline metric: p50 replan latency on BASELINE config 2 (7-DOF arm, 100
waypoints, 50 noisy rollouts/iteration) on one TPU chip, full solve to
collision-free termination. Target from BASELINE.json: < 100 ms
(`vs_baseline` = 100ms / measured — >1 means faster than target).

Secondary metrics (rollouts/s/chip kernel throughput, batched solves/s) print
to stderr and are recorded by bench/ sub-benches.

Run: python bench.py            (real TPU via the axon backend)
     JAX_PLATFORMS=cpu python bench.py   (CPU smoke)
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from tpustomp.api.config import PlannerConfig, NoiseConfig, CostWeights
    from tpustomp.api.plan import plan
    from tpustomp.api.problem import ProblemSpec
    from tpustomp.robot import model
    from tpustomp.world.sdf import AnalyticWorld

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    robot = model.arm_7dof()
    world = AnalyticWorld.make(
        boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25)),
               ((0.68, -0.05, 0.62), (0.06, 0.06, 0.18))])
    cfg = PlannerConfig(
        num_timesteps=100, duration=5.0, num_rollouts=50,
        noise=NoiseConfig(stddev=0.08, decay=0.995, num_rollouts_reused=5),
        weights=CostWeights(obstacle=1.0, smoothness=0.1),
        collision_clearance=0.05, max_iterations=100,
        max_iterations_after_collision_free=5, record_metrics=False,
    )
    q0 = np.asarray([-0.6, 0.5, 0.0, -0.8, 0.0, -0.5, 0.0], np.float32)
    qN = np.asarray([0.4, 0.5, 0.0, -0.8, 0.0, -0.5, 0.0], np.float32)
    prob = ProblemSpec(q0=q0, qN=qN)

    # warmup / compile
    t0 = time.perf_counter()
    sol = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(0))
    jax.block_until_ready(sol.trajectory)
    log(f"compile+first solve: {time.perf_counter() - t0:.2f}s "
        f"(success={bool(sol.success)}, iters={int(sol.iterations)})")

    lat = []
    succ = 0
    for i in range(20):
        key = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        sol = plan(robot, world, prob, cfg, key=key)
        jax.block_until_ready(sol.trajectory)
        lat.append((time.perf_counter() - t0) * 1e3)
        succ += int(bool(sol.success))
    lat = np.array(lat)
    p50 = float(np.percentile(lat, 50))
    log(f"latency ms: p50={p50:.2f} p90={np.percentile(lat, 90):.2f} "
        f"min={lat.min():.2f} success {succ}/20")

    print(json.dumps({
        "metric": "p50_replan_latency_config2",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / p50, 3),
    }))


if __name__ == "__main__":
    main()
