"""Benchmark entry point (driver contract): prints ONE JSON line to stdout.

Headline metric: p50 replan latency on BASELINE config 2 (7-DOF arm, 100
waypoints, 50 noisy rollouts/iteration) on one TPU chip — full solve to
collision-free termination, *end-to-end* including dispatch and result
transfer through the axon relay (~25 ms of fixed overhead in this
environment; the on-device solve itself is ~5 ms). Target from BASELINE.json:
< 100 ms; `vs_baseline` = 100 ms / measured (>1 ⇒ faster than target).

Secondary metrics (batched solves/s, rollouts/s/chip) run when BENCH_FULL=1
(they need a ~1-4 min remote compile) and are written to BENCH_DETAILS.json;
summary lines go to stderr either way.

Run: python bench.py                 (real TPU via the axon backend)
     BENCH_FULL=1 python bench.py    (adds throughput benches)
     JAX_PLATFORMS=cpu python bench.py  (CPU smoke)
"""

import json
import os
import sys
import time

import numpy as np
import jax


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def headline():
    from tpustomp.api.plan import plan
    from tpustomp.api.problem import ProblemSpec
    from bench.common import config2_cfg, config2_scene

    robot, world, q0, qN = config2_scene()
    # latency is relay-dispatch dominated and identical across backends
    # (measured 27.6 vs 28.5 ms); force the XLA path for its far faster
    # compile so the driver's bench run stays robust. The pallas backend is
    # exercised by the BENCH_FULL throughput bench (where it wins 3x).
    cfg = config2_cfg(obstacle_backend="xla")
    prob = ProblemSpec(q0=q0, qN=qN)

    t0 = time.perf_counter()
    sol = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(0))
    _ = float(sol.cost)
    log(f"compile+first solve: {time.perf_counter() - t0:.2f}s "
        f"(success={bool(sol.success)}, iters={int(sol.iterations)})")

    lat, succ, iters = [], 0, []
    for i in range(20):
        t0 = time.perf_counter()
        sol = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(i))
        _ = float(sol.cost)  # force a real device->host transfer
        lat.append((time.perf_counter() - t0) * 1e3)
        succ += int(bool(sol.success))
        iters.append(int(sol.iterations))
    lat = np.asarray(lat)
    res = {
        "p50_ms": float(np.percentile(lat, 50)),
        "p90_ms": float(np.percentile(lat, 90)),
        "min_ms": float(lat.min()),
        "success_rate": succ / 20,
        "mean_iterations": float(np.mean(iters)),
    }
    log(f"replan latency: {res}")
    return res


def throughput(B=256):
    import jax.numpy as jnp
    from tpustomp.api.plan import plan_batch
    from tpustomp.api.problem import ProblemSpec
    from bench.common import config2_cfg, config2_scene

    robot, world, q0, qN = config2_scene()
    cfg = config2_cfg(max_iterations=50)  # obstacle_backend="auto" -> pallas on TPU
    rng = np.random.default_rng(0)
    Q0 = (np.tile(q0, (B, 1)) + rng.uniform(-0.03, 0.03, (B, 7))).astype(np.float32)
    QN = (np.tile(qN, (B, 1)) + rng.uniform(-0.03, 0.03, (B, 7))).astype(np.float32)
    prob = ProblemSpec(q0=Q0, qN=QN)

    t0 = time.perf_counter()
    sol = plan_batch(robot, world, prob, cfg,
                     keys=jax.random.split(jax.random.PRNGKey(0), B))
    _ = float(jnp.sum(sol.cost))
    log(f"batched compile+first: {time.perf_counter() - t0:.1f}s")
    ts = []
    for i in (1, 2, 3):
        t0 = time.perf_counter()
        sol = plan_batch(robot, world, prob, cfg,
                         keys=jax.random.split(jax.random.PRNGKey(i), B))
        _ = float(jnp.sum(sol.cost))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    mi = float(jnp.mean(sol.iterations.astype(jnp.float32)))
    res = {
        "batch": B,
        "solves_per_sec": B / dt,
        "success_rate": float(jnp.mean(sol.success.astype(jnp.float32))),
        "rollouts_per_sec": B * 56 * mi / dt,   # 56 candidate evals/iteration
    }
    log(f"throughput: {res}")
    return res


def main():
    # persistent compile cache: the remote TPU compile of the solver takes
    # minutes cold; cached re-runs start in seconds
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        log(f"compile cache unavailable: {e}")
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    res = headline()
    details = {"replan_latency_config2": res, "device": str(dev)}
    if os.environ.get("BENCH_FULL") == "1":
        details["throughput_config4"] = throughput()
        try:
            from bench.experiment_suite import run_suite
            details["experiment_suite_25"] = run_suite(
                n=25, modes=("stomp", "chomp"))
        except Exception as e:  # pragma: no cover
            log(f"experiment suite skipped: {e}")
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)
    print(json.dumps({
        "metric": "p50_replan_latency_config2",
        "value": round(res["p50_ms"], 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / res["p50_ms"], 3),
    }))


if __name__ == "__main__":
    main()
