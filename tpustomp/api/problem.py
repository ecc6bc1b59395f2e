"""Problem and solution types — the framework's "service API" payloads.

Reference equivalent: the `GetMotionPlan` request/response handled by
`StompPlannerNode::planKinematicPath` (SURVEY §2 L6/L7, §4.2): start joint
state + goal joint constraints in, `JointTrajectory` + success + timing out.
Here both sides are jit-able pytrees so that thousands of problems batch with
`vmap` and shard over a device mesh (SURVEY §3.3 — the scenario axis is the
primary parallel axis).
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp


@struct.dataclass
class ProblemSpec:
    """One planning query: go from q0 to qN.

    q0, qN: [d] joint values (the reference's start_state / joint goal
    constraints). Batched problems stack a leading axis on both.
    """

    q0: jnp.ndarray
    qN: jnp.ndarray


@struct.dataclass
class IterationMetrics:
    """Per-iteration observability arrays (SURVEY §6 metrics row).

    All [max_iterations]-shaped; entries past the converged iteration hold the
    frozen final values (masked fixed-trip iteration, SURVEY §8.3 part 4).
    """

    total_cost: jnp.ndarray       # cost of the updated trajectory
    obstacle_cost: jnp.ndarray
    smoothness_cost: jnp.ndarray
    constraint_cost: jnp.ndarray
    collision_free: jnp.ndarray   # bool per iteration


@struct.dataclass
class Solution:
    """Planner output.

    trajectory: [N+2, d] — all true waypoints including the fixed endpoints
    (the reference returns a `JointTrajectory` with uniform dt timing; here
    `times` carries the same information).
    """

    trajectory: jnp.ndarray
    times: jnp.ndarray            # [N+2] uniform dt timestamps
    success: jnp.ndarray          # bool — collision-free at termination
    cost: jnp.ndarray             # best total cost achieved
    iterations: jnp.ndarray       # iterations actually used
    metrics: IterationMetrics | None = None
