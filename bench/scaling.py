"""BASELINE metric: solves/s scaling over devices/hosts.

On real multi-chip hardware this measures solves/s at 1 chip vs the full
mesh. In this single-chip environment it runs the identical sharded code path
on N virtual CPU devices (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count) and reports parallel efficiency of
the scenario-sharded batch, which is the same collective-free program that
runs on a pod slice (SURVEY §3.4 — comms only at dispatch/gather).
"""

import sys

import numpy as np
import jax

sys.path.insert(0, ".")
from bench.common import config2_cfg, config2_scene, log, timed  # noqa: E402


def run(per_device=8):
    from tpustomp.api.problem import ProblemSpec
    from tpustomp.engine import distributed

    robot, world, q0, qN = config2_scene()
    cfg = config2_cfg(num_timesteps=30, num_rollouts=10, max_iterations=30,
                      max_iterations_after_collision_free=10**6)
    ndev = jax.device_count()
    rng = np.random.default_rng(0)
    out = {}
    base_rate = None
    for n in sorted({1, max(2, ndev // 2), ndev}):
        mesh = distributed.make_mesh(jax.devices()[:n])
        B = per_device * n
        Q0 = (np.tile(q0, (B, 1))
              + rng.uniform(-0.03, 0.03, (B, 7))).astype(np.float32)
        QN = (np.tile(qN, (B, 1))
              + rng.uniform(-0.03, 0.03, (B, 7))).astype(np.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), B)

        def fn():
            return distributed.plan_sharded(
                robot, world, ProblemSpec(q0=Q0, qN=QN), cfg,
                keys=keys, mesh=mesh)

        t = timed(fn, n=3)
        rate = B / t
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        out[f"devices_{n}"] = {"solves_per_sec": rate, "efficiency": eff}
        log(f"devices={n} B={B}: {rate:.1f} solves/s efficiency={eff:.2f}")
    return out


if __name__ == "__main__":
    import json
    print(json.dumps(run()))
