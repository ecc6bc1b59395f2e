"""BASELINE metric: noisy rollouts/s/chip of the fused rollout-evaluation
kernel (SURVEY §4.4) — sample K rollouts → joint limits → FK → SDF → cost.

Measured as the slope between two iteration counts of the full solver loop
(fixed overhead cancels), at both the latency shape (1 scenario) and the
throughput shape (batched scenarios), plus a speed-of-light estimate.
"""

import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from bench.common import config2_cfg, config2_scene, log, timed  # noqa: E402


def _solve_fn(cfg, batch=None):
    from tpustomp.dynamics.device import device_ops
    from tpustomp.engine import solver

    assert cfg.obstacle_backend != "auto", \
        "resolve the backend before timing (solver treats 'auto' as xla)"
    ops = device_ops(cfg.num_timesteps, cfg.dt, cfg.smoothness)

    if batch is None:
        @jax.jit
        def run(robot, world, ops, q0, qN, key):
            return solver.solve(robot, world, None, cfg, ops, q0, qN, key)
        return run, ops

    @jax.jit
    def run(robot, world, ops, q0, qN, keys):
        # fused batched path (one kernel launch for all scenarios' candidates)
        return solver.solve_batch(robot, world, None, cfg, ops, q0, qN, keys)
    return run, ops


def run(batch=64, iters_lo=100, iters_hi=400):
    import jax.numpy as jnp
    from tpustomp.api.plan import resolve_backend

    robot, world, q0, qN = config2_scene()
    q0j, qNj = jnp.asarray(q0), jnp.asarray(qN)
    out = {"backend": resolve_backend(config2_cfg(), robot,
                                      world).obstacle_backend}
    for label, B in (("latency_1_scenario", None), (f"throughput_B{batch}", batch)):
        times = {}
        for iters in (iters_lo, iters_hi):
            cfg = config2_cfg(max_iterations=iters,
                              max_iterations_after_collision_free=10**6)
            cfg = resolve_backend(cfg, robot, world)
            fn, ops = _solve_fn(cfg, B)
            if B is None:
                args = (robot, world, ops, q0j, qNj, jax.random.PRNGKey(0))
            else:
                rng = np.random.default_rng(0)
                Q0 = jnp.asarray(np.tile(q0, (B, 1))
                                 + rng.uniform(-0.03, 0.03, (B, 7)).astype(np.float32))
                QN = jnp.asarray(np.tile(qN, (B, 1))
                                 + rng.uniform(-0.03, 0.03, (B, 7)).astype(np.float32))
                args = (robot, world, ops, Q0, QN,
                        jax.random.split(jax.random.PRNGKey(0), B))
            times[iters] = timed(fn, *args, n=3)
            log(f"{label} iters={iters}: {times[iters]*1e3:.1f} ms")
        per_iter = (times[iters_hi] - times[iters_lo]) / (iters_hi - iters_lo)
        K = 56  # 1 current + 50 new + 5 reused candidate evaluations
        scen = 1 if B is None else B
        out[label] = {
            "per_iteration_ms": per_iter * 1e3,
            "rollouts_per_sec": scen * K / per_iter,
        }
        log(f"{label}: {out[label]}")
    return out


if __name__ == "__main__":
    import json
    print(json.dumps(run()))
