"""MPC replanning loop with moving obstacles (BASELINE config 5).

Reference equivalent: none — the reference plans once per `GetMotionPlan`
call; replanning against a changing world was done by re-calling the service.
Here replanning is a first-class, batched, shardable loop:

  every control tick:
    1. advance the world (analytic obstacles move; a pytree update — no EDT
       rebuild, SURVEY §8.3 hard part 6),
    2. execute the first waypoint of the current plan (q ← trajectory[1]),
    3. warm-start θ by shifting the previous solution one step toward the
       goal, 4. re-solve with a small iteration budget.

Scenarios are independent (own start/goal/obstacle state), so the whole loop
vmaps over a scenario batch and shards over the "scenario" mesh axis exactly
like plan_sharded (10k scenarios across a pod slice, SURVEY §3.3). Host-level
retry of a failed shard is trivial because MPCState is a pytree and the loop
is stateless given it (SURVEY §6 failure-recovery row).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from tpustomp.api.config import PlannerConfig
from tpustomp.dynamics.device import device_ops
from tpustomp.engine import solver
from tpustomp.engine.distributed import SCENARIO_AXIS, make_mesh, _shard_batch
from tpustomp.engine.trajectory import min_jerk_init
from tpustomp.robot.model import RobotSpec
from tpustomp.world.sdf import AnalyticWorld


@struct.dataclass
class MPCState:
    """Per-scenario replanning state (batch axis optional on every leaf)."""

    q: jnp.ndarray              # [d] current configuration
    qN: jnp.ndarray             # [d] goal
    theta: jnp.ndarray          # [N, d] current plan (free waypoints)
    sphere_center: jnp.ndarray  # [S, 3] moving obstacle positions
    sphere_vel: jnp.ndarray     # [S, 3] obstacle velocities
    key: jax.Array
    steps: jnp.ndarray          # int32 ticks executed
    collided: jnp.ndarray       # bool — executed waypoint hit an obstacle


def init_mpc(robot: RobotSpec, cfg: PlannerConfig, q0, qN, sphere_center,
             sphere_vel, key) -> MPCState:
    theta = min_jerk_init(jnp.asarray(q0, jnp.float32),
                          jnp.asarray(qN, jnp.float32), cfg.num_timesteps)
    return MPCState(
        q=jnp.asarray(q0, jnp.float32),
        qN=jnp.asarray(qN, jnp.float32),
        theta=theta,
        sphere_center=jnp.asarray(sphere_center, jnp.float32),
        sphere_vel=jnp.asarray(sphere_vel, jnp.float32),
        key=key,
        steps=jnp.int32(0),
        collided=jnp.bool_(False),
    )


def _shift_warm_start(theta, qN):
    """Shift the plan one waypoint toward the goal (execute-and-slide)."""
    return jnp.concatenate([theta[1:], qN[None, :]], axis=0)


def mpc_step(robot: RobotSpec, cfg: PlannerConfig, ops, state: MPCState,
             sphere_radius: jnp.ndarray, world_dt: float) -> MPCState:
    """One control tick: move world, execute one waypoint, replan."""
    # 1. world advances
    centers = state.sphere_center + state.sphere_vel * world_dt
    world = AnalyticWorld(
        sphere_center=centers, sphere_radius=sphere_radius,
        box_center=jnp.zeros((0, 3), jnp.float32),
        box_half=jnp.zeros((0, 3), jnp.float32))

    # 2. execute the first planned waypoint
    q_next = state.theta[0]

    # 3+4. warm start and replan from the advanced state
    theta0 = _shift_warm_start(state.theta, state.qN)
    key, sub = jax.random.split(state.key)
    sol = solver.solve(robot, world, None, cfg, ops, q_next, state.qN, sub,
                       theta0=theta0)
    theta_new = sol.trajectory[1:-1]

    # collision check of the executed configuration
    from tpustomp.robot.fk import body_positions
    from tpustomp.world.sdf import sdf
    x = body_positions(robot, q_next)
    margin = jnp.min(sdf(world, x) - robot.body_radius)
    return state.replace(
        q=q_next,
        theta=theta_new,
        sphere_center=centers,
        key=key,
        steps=state.steps + 1,
        collided=state.collided | (margin <= 0.0),
    )


def run_mpc(robot: RobotSpec, cfg: PlannerConfig, state: MPCState,
            sphere_radius, num_ticks: int, world_dt: float) -> MPCState:
    """Run `num_ticks` control steps (lax.scan; jit/vmap/shard-able)."""
    ops = device_ops(cfg.num_timesteps, cfg.dt, cfg.smoothness)

    def tick(s, _):
        return mpc_step(robot, cfg, ops, s, sphere_radius, world_dt), None

    state, _ = jax.lax.scan(tick, state, None, length=num_ticks)
    return state


@functools.lru_cache(maxsize=8)
def _sharded_mpc(cfg: PlannerConfig, mesh, num_ticks: int, world_dt: float):
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    replicated = NamedSharding(mesh, P())

    def run(robot, state, sphere_radius):
        return jax.vmap(
            lambda s: run_mpc(robot, cfg, s, sphere_radius, num_ticks,
                              world_dt)
        )(state)

    return jax.jit(run, in_shardings=(replicated, sharding, replicated),
                   out_shardings=sharding)


def run_mpc_sharded(robot: RobotSpec, cfg: PlannerConfig, state: MPCState,
                    sphere_radius, num_ticks: int, world_dt: float,
                    mesh=None) -> MPCState:
    """Batched MPC over the scenario mesh (BASELINE config 5).

    `state` leaves carry a leading [batch] axis (process-local shard in
    multi-host mode). Scenario count must divide by the mesh size.
    """
    if mesh is None:
        mesh = make_mesh()
    from tpustomp.api.plan import resolve_backend
    from tpustomp.world.sdf import AnalyticWorld
    probe = AnalyticWorld(
        sphere_center=jnp.zeros((1, 3)), sphere_radius=jnp.ones((1,)),
        box_center=jnp.zeros((0, 3)), box_half=jnp.zeros((0, 3)))
    cfg = resolve_backend(cfg, robot, probe)
    state = jax.tree.map(lambda x: _shard_batch(np.asarray(x), mesh), state)
    fn = _sharded_mpc(cfg, mesh, num_ticks, world_dt)
    return fn(robot, state, jnp.asarray(sphere_radius, jnp.float32))
