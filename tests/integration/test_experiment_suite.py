"""The paper-style experiment harness (bench/experiment_suite.py) end-to-end
on a small problem count: hard-problem sampling + batched solve + metrics.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from bench.experiment_suite import (run_suite, sample_problems,  # noqa: E402
                                    shelf_scene)
from tpustomp.robot import model  # noqa: E402


def test_hard_problem_sampler():
    """Sampled problems: endpoints collision-free, straight line colliding."""
    import jax.numpy as jnp

    from tpustomp.engine.trajectory import min_jerk_init
    from tpustomp.robot.fk import body_positions
    from tpustomp.world.sdf import sdf

    robot = model.arm_7dof()
    world = shelf_scene()
    q0s, qNs = sample_problems(robot, world, 6, seed=1)
    assert q0s.shape == (6, 7) and qNs.shape == (6, 7)

    def margin(q):
        x = body_positions(robot, jnp.asarray(q))
        return float(jnp.min(sdf(world, x) - robot.body_radius))

    for q0, qN in zip(q0s, qNs):
        assert margin(q0) > 0.0 and margin(qN) > 0.0
        line = np.concatenate(
            [q0[None], np.asarray(min_jerk_init(jnp.asarray(q0),
                                                jnp.asarray(qN), 16)),
             qN[None]])
        assert min(margin(q) for q in line) < 0.0, "problem is not hard"


def test_suite_stomp_solves_hard_shelf_problems():
    res = run_suite(n=4, seed=2, scenes=("shelf",), modes=("stomp",))
    r = res["shelf/stomp"]
    assert r["n"] == 4
    assert r["success_rate"] >= 0.75
