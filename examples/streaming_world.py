"""Streaming collision-map cadence: sensor points -> incremental SDF update
-> replan (the reference's collision-map topic callbacks, SURVEY §4.1, as a
living loop). Run:  python examples/streaming_world.py

The reference's ``StompCollisionSpace`` subscribes to collision-map /
point-cloud topics and folds each message into its
``PropagationDistanceField``; every later ``GetMotionPlan`` call plans
against the updated field. Here the same cadence is a host loop:

    every sensor frame:
      1. IncrementalSDF.add_points(frame)    # O(changed region) EDT patch
      2. replan from the current configuration, warm-started
      3. execute a few waypoints of the new plan

Per-control-tick *moving* obstacles stay on the CompositeWorld analytic
overlay (engine/mpc.py); this loop is for STRUCTURAL world changes at
sensor cadence — newly observed geometry that joins the static field.
"""

import os as _os
import sys as _sys

# make "python examples/<name>.py" work without installing the package
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.api.config import PlannerConfig, NoiseConfig
from tpustomp.api.plan import plan
from tpustomp.api.problem import ProblemSpec
from tpustomp.robot import model
from tpustomp.robot.fk import body_positions
from tpustomp.world.edt import IncrementalSDF
from tpustomp.world.sdf import sdf


def obstacle_point_frame(center, n=400, extent=0.18, seed=0):
    """Simulated sensor frame: a point cluster on a newly observed obstacle."""
    rng = np.random.default_rng(seed)
    return center + rng.uniform(-extent, extent, (n, 3)).astype(np.float32)


def ee_position(robot, q):
    return np.asarray(body_positions(robot, jnp.asarray(q))[-1])


def main():
    robot = model.planar_2r(body_radius=0.05)
    cfg = PlannerConfig(
        num_timesteps=20, duration=2.1, num_rollouts=10,
        noise=NoiseConfig(stddev=0.25, decay=1.0, num_rollouts_reused=2),
        collision_clearance=0.1, max_iterations=40,
        max_iterations_after_collision_free=3, record_metrics=False)

    # empty 5 m x 5 m x 1 m field at 5 cm resolution, planar workspace
    inc = IncrementalSDF(np.zeros((100, 100, 20), bool),
                         origin=(-2.5, -2.5, -0.5), resolution=0.05,
                         max_distance=0.5)

    q = np.array([-0.56, 1.65], np.float32)
    qN = np.array([1.16, -1.46], np.float32)
    sol = plan(robot, inc.as_world(), ProblemSpec(q0=q, qN=qN), cfg,
               key=jax.random.PRNGKey(0))
    print(f"frame 0 (empty world): success={bool(sol.success)} "
          f"iters={int(sol.iterations)}")

    for frame in range(1, 4):
        # execute a third of the plan, then a sensor frame arrives: points
        # on an obstacle that appeared ON the remaining path
        k = cfg.num_timesteps // 3
        q = np.asarray(sol.trajectory[k])
        block_at = ee_position(robot, sol.trajectory[2 * k])
        inc.add_points(obstacle_point_frame(block_at, seed=frame))

        old_margin = float(jnp.min(
            sdf(inc.as_world(),
                jax.vmap(lambda qq: body_positions(robot, qq))(
                    sol.trajectory)) - robot.body_radius))
        sol = plan(robot, inc.as_world(), ProblemSpec(q0=q, qN=qN), cfg,
                   key=jax.random.PRNGKey(frame))
        new_margin = float(jnp.min(
            sdf(inc.as_world(),
                jax.vmap(lambda qq: body_positions(robot, qq))(
                    sol.trajectory)) - robot.body_radius))
        print(f"frame {frame}: old plan margin {old_margin:+.3f} m -> "
              f"replanned success={bool(sol.success)} "
              f"margin {new_margin:+.3f} m iters={int(sol.iterations)}")


if __name__ == "__main__":
    main()
