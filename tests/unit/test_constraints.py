"""Constraint cost tests (SURVEY A.6 — the "glass of water" evaluator)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.api.config import PlannerConfig, NoiseConfig, CostWeights
from tpustomp.api.plan import plan
from tpustomp.api.problem import ProblemSpec
from tpustomp.costs.constraints import (OrientationConstraint,
                                        PositionConstraint, constraint_cost)
from tpustomp.robot import model


def test_orientation_cost_matches_analytic_planar():
    """Planar 2R: the EE frame x-axis points along q1+q2; the geodesic angle
    to the world x-axis is |q1+q2| (mod wrap)."""
    robot = model.planar_2r()
    c = OrientationConstraint.make(axis_local=(1, 0, 0),
                                   target_world=(1, 0, 0),
                                   tolerance=0.1, weight=2.0)
    traj = jnp.asarray([[0.2, 0.1], [0.0, 0.0], [-0.4, -0.3]], jnp.float32)
    got = np.asarray(constraint_cost(robot, c, traj))
    for i, q in enumerate(np.asarray(traj)):
        ang = abs(q[0] + q[1])
        want = 2.0 * max(ang - 0.1, 0.0) ** 2
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_position_cost_zero_inside_tolerance():
    robot = model.planar_2r()
    # EE at q=(0,0) is (2,0,0)
    c = PositionConstraint.make(target_world=(2.0, 0.0, 0.0), tolerance=0.05)
    traj = jnp.zeros((3, 2), jnp.float32)
    np.testing.assert_allclose(np.asarray(constraint_cost(robot, c, traj)),
                               0.0, atol=1e-7)
    c2 = PositionConstraint.make(target_world=(2.5, 0.0, 0.0), tolerance=0.1)
    got = np.asarray(constraint_cost(robot, c2, traj))
    np.testing.assert_allclose(got, (0.5 - 0.1) ** 2, atol=1e-5)


def test_multiple_constraints_sum():
    robot = model.planar_2r()
    a = OrientationConstraint.make(tolerance=0.0)
    b = PositionConstraint.make(target_world=(9.0, 0.0, 0.0), tolerance=0.0)
    traj = jnp.asarray([[0.3, 0.4]], jnp.float32)
    ca = constraint_cost(robot, a, traj)
    cb = constraint_cost(robot, b, traj)
    cab = constraint_cost(robot, (a, b), traj)
    np.testing.assert_allclose(np.asarray(cab), np.asarray(ca + cb), atol=1e-6)


def test_constrained_solve_reduces_constraint_cost():
    """Config-1 scene + keep the EE x-axis near world-x: the constrained
    solve must end with a much lower constraint cost than the unconstrained
    solution evaluates to."""
    robot = model.planar_2r(body_radius=0.05)
    from tpustomp.world.sdf import AnalyticWorld
    world = AnalyticWorld.make(spheres=[((10.0, 10.0, 0.0), 0.1)])
    q0 = np.array([-0.4, 0.5], np.float32)
    qN = np.array([0.5, -0.6], np.float32)
    con = OrientationConstraint.make(axis_local=(1, 0, 0),
                                     target_world=(1, 0, 0),
                                     tolerance=0.05, weight=1.0)
    cfg = PlannerConfig(
        num_timesteps=20, duration=2.1, num_rollouts=10,
        noise=NoiseConfig(stddev=0.2, decay=0.995, num_rollouts_reused=3),
        weights=CostWeights(obstacle=1.0, smoothness=0.05, constraint=20.0),
        collision_clearance=0.1, max_iterations=80,
        max_iterations_after_collision_free=10**6,
    )
    prob = ProblemSpec(q0=q0, qN=qN)
    sol_free = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(1))
    sol_con = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(1),
                   constraints=con)
    cc_free = float(jnp.sum(constraint_cost(robot, con, sol_free.trajectory)))
    cc_con = float(jnp.sum(constraint_cost(robot, con, sol_con.trajectory)))
    assert cc_con < 0.5 * cc_free, (cc_con, cc_free)


def test_chomp_mode_optimizes_constraint_cost():
    """CHOMP mode must DESCEND the constraint term, not merely monitor it
    (round-5 fix: the gradient previously contained only obstacle +
    smoothness, so a constrained CHOMP solve left the violation exactly
    where the initialization put it). Checked for both gradient modes."""
    from tpustomp.world.sdf import AnalyticWorld

    robot = model.planar_2r()
    world = AnalyticWorld.make()          # free space: isolate the cone
    q0 = np.array([-0.4, 0.5], np.float32)
    qN = np.array([0.5, -0.6], np.float32)
    con = OrientationConstraint.make(axis_local=(1, 0, 0),
                                     target_world=(1, 0, 0),
                                     tolerance=0.05, weight=1.0)
    for gmode in ("functional", "exact"):
        cfg = PlannerConfig(
            mode="chomp", chomp_gradient_mode=gmode, learning_rate=0.2,
            num_timesteps=20, duration=2.1, num_rollouts=1,
            weights=CostWeights(obstacle=1.0, smoothness=0.05,
                                constraint=20.0),
            collision_clearance=0.1, max_iterations=80,
            max_iterations_after_collision_free=10**6)
        prob = ProblemSpec(q0=q0, qN=qN)
        base = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(1))
        sol = plan(robot, world, prob, cfg, key=jax.random.PRNGKey(1),
                   constraints=con)
        cc_base = float(jnp.sum(constraint_cost(robot, con,
                                                base.trajectory)))
        cc_sol = float(jnp.sum(constraint_cost(robot, con, sol.trajectory)))
        assert cc_sol < 0.5 * cc_base, (gmode, cc_sol, cc_base)
