"""MPC replanning against a moving obstacle (BASELINE config 5, single
scenario). Run:  python examples/mpc_moving_obstacle.py
"""

import os as _os
import sys as _sys

# make "python examples/<name>.py" work without installing the package
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.api.config import PlannerConfig, NoiseConfig
from tpustomp.engine import mpc
from tpustomp.robot import model


def main():
    robot = model.planar_2r(body_radius=0.05)
    cfg = PlannerConfig(
        num_timesteps=20, duration=2.1, num_rollouts=8,
        noise=NoiseConfig(stddev=0.25, decay=1.0, num_rollouts_reused=2),
        collision_clearance=0.1, max_iterations=8,
        max_iterations_after_collision_free=2, record_metrics=False)
    state = mpc.init_mpc(
        robot, cfg,
        q0=np.array([-0.56, 1.65], np.float32),
        qN=np.array([1.16, -1.46], np.float32),
        sphere_center=np.array([[2.4, -0.6, 0.0]], np.float32),
        sphere_vel=np.array([[-0.15, 0.25, 0.0]], np.float32),
        key=jax.random.PRNGKey(0))
    out = mpc.run_mpc(robot, cfg, state, jnp.asarray([0.25], jnp.float32),
                      num_ticks=15, world_dt=0.1)
    print(f"executed {int(out.steps)} ticks; collided={bool(out.collided)}; "
          f"final q={np.asarray(out.q).round(3)}")


if __name__ == "__main__":
    main()
