"""BASELINE metric: p50 replan latency on config 2 (7-DOF, 100 wp, 50
rollouts/iter), full solve to collision-free termination on one chip.

Reports end-to-end latency (dispatch + solve + result transfer) and the
derived pure device per-iteration cost. Target: < 100 ms (BASELINE.json).
"""

import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")
from bench.common import config2_cfg, config2_scene, log  # noqa: E402


def run(n=20):
    from tpustomp.api.plan import plan
    from tpustomp.api.problem import ProblemSpec

    robot, world, q0, qN = config2_scene()
    cfg = config2_cfg()
    prob = ProblemSpec(q0=q0, qN=qN)

    t0 = time.perf_counter()
    sol = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(0))
    _ = float(sol.cost)
    log(f"compile+first: {time.perf_counter() - t0:.2f}s "
        f"(iters={int(sol.iterations)} success={bool(sol.success)})")

    lat, iters, succ = [], [], 0
    for i in range(n):
        t0 = time.perf_counter()
        sol = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(i))
        _ = float(sol.cost)  # force a real device->host transfer
        lat.append((time.perf_counter() - t0) * 1e3)
        iters.append(int(sol.iterations))
        succ += int(bool(sol.success))
    lat = np.asarray(lat)
    res = {
        "p50_ms": float(np.percentile(lat, 50)),
        "p90_ms": float(np.percentile(lat, 90)),
        "min_ms": float(lat.min()),
        "mean_iterations": float(np.mean(iters)),
        "success_rate": succ / n,
    }
    log(f"replan latency: {res}")
    return res


if __name__ == "__main__":
    import json
    print(json.dumps(run()))
