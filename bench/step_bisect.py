"""Within-process stage bisection of the batched time-major STOMP step.

Answers ONE question on the real chip: where does the per-iteration time go
at the config-4 shape, stage by stage — the measurement behind the in-kernel
PI² decision (VERDICT r3 item 4 / SURVEY §4.4 speed-of-light). Variants
re-implement solver.make_step_batch_tm's pipeline with later stages cut off
(timing-only duplicate — parity lives in the solver; each variant folds its
outputs into the loop carry so nothing dead-code-eliminates):

  propose   sample_noise_tm + candidate assembly + limit clip
  kernel    + the fused Pallas FK→SDF→cost launch
  reduce    + ctrl rows, S sums, totals
  pi2       + softmax, update_tm_cand, M projection, limit clip of θ'
  reuse     + top-k + reuse gather
  full      the production step (bookkeeping + freeze mask) via
            make_step_batch_tm itself

Method: each variant runs `iters` iterations inside ONE jitted fori_loop;
per-iteration cost = slope between iters_lo and iters_hi (fixed dispatch
cancels); stage cost = difference between consecutive variants. Repeated
`reps` times; medians reported. Run on TPU:  python -m bench.step_bisect
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench.common import config2_cfg, config2_scene, log  # noqa: E402


def build_variant(robot, world, cfg, ops, Q0, QN, stage: str):
    from tpustomp.engine import pi2, solver
    from tpustomp.engine.limits import project_limits
    from tpustomp.engine.sampling import sample_noise_tm
    from tpustomp.costs.smoothness import smoothness_cost_per_timestep_tm
    from tpustomp.kernels.rollout_pallas import obstacle_cost_batch_pallas

    B = Q0.shape[0]
    d = robot.num_joints
    N = cfg.num_timesteps
    K = cfg.num_rollouts
    Kr = cfg.noise.num_rollouts_reused
    C = 1 + K + Kr
    sigma0 = jnp.asarray(cfg.noise_stddevs(d), jnp.float32)
    q0_tm = jnp.transpose(Q0)
    qN_tm = jnp.transpose(QN)
    project = lambda th: project_limits(th, robot.joint_lower,
                                        robot.joint_upper,
                                        robot.joint_limited, ops.Rinv,
                                        cfg.joint_limit_iterations,
                                        cfg.joint_limit_method)

    if stage == "full":
        step = solver.make_step_batch_tm(robot, world, None, cfg, ops,
                                         Q0, QN)

        def body(i, carry):
            st = step(carry)
            return st.replace(done=jnp.zeros_like(st.done),
                              iteration=jnp.zeros_like(st.iteration))

        def run(keys, iters):
            init = jax.vmap(lambda a, b, k: solver.init_state(
                robot, cfg, a, b, k))(Q0, QN, keys)
            out = jax.lax.fori_loop(0, iters, body, init)
            return jnp.sum(out.theta)

        return run

    def run(keys, iters):
        theta0 = jax.vmap(lambda a, b: jnp.linspace(a, b, N + 2)[1:-1]
                          )(Q0, QN)
        reuse0 = jnp.broadcast_to(theta0[:, None], (B, Kr, N, d))

        def body(i, carry):
            theta, reuse, keys = carry
            splits = jax.vmap(jax.random.split)(keys)
            keys_new, k_noise = splits[:, 0], splits[:, 1]
            sigma = sigma0[None, :] * jnp.ones((B, 1), jnp.float32)
            theta_tm = jnp.transpose(theta, (1, 2, 0))
            eps_tm = sample_noise_tm(k_noise, ops.L_sample, sigma, K)
            reuse_tm = jnp.transpose(reuse, (2, 3, 0, 1))
            cand_tm = jnp.concatenate(
                [theta_tm[..., None], theta_tm[..., None] + eps_tm,
                 reuse_tm], axis=3)
            cand_tm = jnp.where(
                robot.joint_limited[None, :, None, None],
                jnp.clip(cand_tm, robot.joint_lower[None, :, None, None],
                         robot.joint_upper[None, :, None, None]),
                cand_tm)
            if stage == "propose":
                # consume cand so the whole propose chain stays live
                theta = theta + 1e-12 * jnp.transpose(
                    cand_tm[..., 1], (2, 0, 1))
                return theta, reuse, keys_new

            full_tm = jnp.concatenate([
                jnp.broadcast_to(q0_tm[None, :, :, None], (1, d, B, C)),
                cand_tm,
                jnp.broadcast_to(qN_tm[None, :, :, None], (1, d, B, C)),
            ], axis=0).reshape(N + 2, d, B * C)
            tm = jnp.transpose(full_tm, (1, 0, 2))
            q_obs, margins = obstacle_cost_batch_pallas(
                robot, world, jnp.transpose(tm, (2, 1, 0)),
                cfg.dt, cfg.collision_clearance,
                row_active=jnp.ones((B * C,), bool))
            if stage == "kernel":
                theta = theta + 1e-12 * q_obs[:B].reshape(B, 1, -1)[:, :, :d]
                return theta, reuse, keys_new

            q_obs = q_obs.reshape(B, C, N + 2)
            margins = margins.reshape(B, C)
            ctrl_all = smoothness_cost_per_timestep_tm(ops, cand_tm, Q0, QN)
            S_all = cfg.weights.obstacle * q_obs
            ctrl_sums = jnp.sum(ctrl_all, axis=2)
            totals = (jnp.sum(S_all, axis=2)
                      + cfg.weights.smoothness * ctrl_sums)
            if stage == "reduce":
                theta = theta + 1e-12 * totals[:, :d][:, None, :]
                theta = theta + 1e-12 * margins[:, :1, None]
                return theta, reuse, keys_new

            S_used = S_all[:, 1:, :]
            delta = pi2.update_tm_cand(cand_tm[..., 1:], theta_tm,
                                       S_used[:, :, 1:-1], ops.M, cfg.pi2_h)
            theta_new = jax.vmap(project)(theta + delta)
            if stage == "pi2":
                theta = theta_new + 1e-12 * margins[:, :1, None]
                return theta, reuse, keys_new

            _, keep = jax.lax.top_k(-totals[:, 1:],
                                    cfg.noise.num_rollouts_reused)
            keep_oh = jax.nn.one_hot(keep + 1, C, dtype=cand_tm.dtype)
            reuse_new = jnp.einsum("ndbc,brc->brnd", cand_tm, keep_oh,
                                   precision=jax.lax.Precision.HIGHEST)
            assert stage == "reuse", stage
            theta = theta_new + 1e-12 * margins[:, :1, None]
            return theta, reuse_new, keys_new

        th, _, _ = jax.lax.fori_loop(0, iters, body, (theta0, reuse0, keys))
        return jnp.sum(th)

    return run


STAGES = ("propose", "kernel", "reduce", "pi2", "reuse", "full")


def run(B=256, iters_lo=40, iters_hi=120, reps=5, stages=STAGES):
    from tpustomp.api.plan import resolve_backend

    robot, world, q0, qN = config2_scene()
    cfg = resolve_backend(
        config2_cfg(max_iterations=10**6,
                    max_iterations_after_collision_free=10**6,
                    record_metrics=False),
        robot, world, batch_hint=B)
    assert cfg.obstacle_backend == "pallas", "bisect needs the fused kernel"
    from tpustomp.dynamics.device import device_ops
    rng = np.random.default_rng(0)
    Q0 = jnp.asarray(np.tile(q0, (B, 1))
                     + rng.uniform(-0.03, 0.03, (B, 7)), jnp.float32)
    QN = jnp.asarray(np.tile(qN, (B, 1))
                     + rng.uniform(-0.03, 0.03, (B, 7)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    ops = device_ops(cfg.num_timesteps, cfg.dt, cfg.smoothness)

    out = {"batch": B, "iters_slope": [iters_lo, iters_hi], "n": reps}
    prev = None
    for stage in stages:
        fn = jax.jit(build_variant(robot, world, cfg, ops, Q0, QN, stage),
                     static_argnums=1)
        float(fn(keys, iters_lo))  # compile + warm both trip counts
        float(fn(keys, iters_hi))

        def t(iters, fn=fn):
            t0 = time.perf_counter()
            s = float(fn(keys, iters))
            assert np.isfinite(s)
            return time.perf_counter() - t0

        slopes = []
        for _ in range(reps):
            lo = t(iters_lo)
            hi = t(iters_hi)
            slopes.append((hi - lo) / (iters_hi - iters_lo))
        med = float(np.median(slopes))
        out[stage] = {
            "per_iter_ms": {"median": med * 1e3,
                            "min": float(np.min(slopes)) * 1e3,
                            "max": float(np.max(slopes)) * 1e3},
            "stage_delta_ms": None if prev is None else (med - prev) * 1e3,
            "rollouts_per_sec": B * 56 / med,
        }
        log(f"{stage}: {out[stage]}")
        prev = med
    return out


if __name__ == "__main__":
    import json

    print(json.dumps(run()))
