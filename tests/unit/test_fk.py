"""FK + Jacobian tests vs the analytic oracle (SURVEY §5.2)."""

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from tpustomp.robot import model
from tpustomp.robot.fk import (body_positions, body_positions_and_jacobians,
                               fk_frames, rodrigues)


def test_rodrigues_basic():
    Rz = rodrigues(jnp.array([0.0, 0.0, 1.0]), jnp.float32(np.pi / 2))
    np.testing.assert_allclose(
        np.asarray(Rz @ jnp.array([1.0, 0.0, 0.0])), [0, 1, 0], atol=1e-6)
    # rotation matrix properties for a random axis/angle
    ax = jnp.array([0.267, 0.534, 0.802])
    ax = ax / jnp.linalg.norm(ax)  # rodrigues requires a unit axis
    R = np.asarray(rodrigues(ax, jnp.float32(0.7)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_planar2r_fk_matches_closed_form():
    robot = model.planar_2r()
    rng = np.random.default_rng(3)
    for _ in range(10):
        q = rng.uniform(-np.pi, np.pi, 2)
        x = np.asarray(body_positions(robot, jnp.asarray(q, jnp.float32)))
        p1, p2 = oracle.fk_planar2r(q)
        np.testing.assert_allclose(x[0, :2], p1, atol=1e-5)
        np.testing.assert_allclose(x[1, :2], p2, atol=1e-5)
        np.testing.assert_allclose(x[:, 2], 0.0, atol=1e-6)


def test_planar2r_jacobian_matches_analytic():
    robot = model.planar_2r()
    q = np.array([0.4, -0.9])
    _, J = body_positions_and_jacobians(robot, jnp.asarray(q, jnp.float32))
    J_ee = np.asarray(J)[1, :2, :]          # xy rows of the EE body
    np.testing.assert_allclose(J_ee, oracle.jac_planar2r_ee(q), atol=1e-5)


def test_jacobian_matches_finite_difference_7dof():
    robot = model.arm_7dof()
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(-1, 1, 7), jnp.float32)
    x0, J = body_positions_and_jacobians(robot, q)
    x0, J = np.asarray(x0), np.asarray(J)
    h = 1e-3
    for i in range(7):
        dq = jnp.zeros(7).at[i].set(h)
        xp = np.asarray(body_positions(robot, q + dq))
        xm = np.asarray(body_positions(robot, q - dq))
        np.testing.assert_allclose(J[:, :, i], (xp - xm) / (2 * h), atol=2e-2)


def test_7dof_frames_finite_and_reachable():
    robot = model.arm_7dof()
    q = jnp.zeros(7)
    pos, rot, axis_w = fk_frames(robot, q)
    assert np.all(np.isfinite(np.asarray(pos)))
    x = np.asarray(body_positions(robot, q))
    # all spheres within total reach of the base
    reach = 0.8 + 0.1 + 0.40 + 0.32 + 0.16 + 0.1
    assert np.all(np.linalg.norm(x, axis=1) < reach)
    # arm at zero config extends along +x from the shoulder
    assert x[:, 0].max() > 0.5


def test_fk_vmaps_over_waypoints():
    robot = model.arm_7dof()
    qs = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (16, 7)), jnp.float32)
    xs = jax.vmap(lambda q: body_positions(robot, q))(qs)
    assert xs.shape == (16, robot.num_bodies, 3)
    x0 = body_positions(robot, qs[3])
    np.testing.assert_allclose(np.asarray(xs[3]), np.asarray(x0), atol=1e-6)


def test_prismatic_body_motion_and_jacobian():
    """Bodies on a prismatic link translate with q; J matches FD (A.11).

    Regression: fk_frames used to emit the PRE-joint-motion origin, so a
    sphere attached to a prismatic link never moved with that joint while
    its Jacobian column (axis_w) claimed it did.
    """
    robot = model._spec(
        joint_axis=[[0, 0, 1], [1, 0, 0], [0, 0, 1]],
        joint_offset=[[0, 0, 0], [0.5, 0, 0], [0.3, 0, 0]],
        joint_rot=model._eye(3),
        lower=[-3.0, 0.0, -3.0], upper=[3.0, 0.6, 3.0],
        limited=[True, True, True],
        joint_type=[model.REVOLUTE, model.PRISMATIC, model.REVOLUTE],
        body_link=[0, 1, 2],
        body_offset=[[0.25, 0, 0], [0.1, 0, 0], [0.2, 0, 0]],
        body_radius=[0.05, 0.05, 0.05],
    )
    q = jnp.asarray([0.3, 0.25, -0.7], jnp.float32)
    # the prismatic joint must translate its own body along the (rotated) x
    x_a = np.asarray(body_positions(robot, q))
    x_b = np.asarray(body_positions(robot, q.at[1].add(0.1)))
    shift = x_b[1] - x_a[1]
    axis_w = np.array([np.cos(0.3), np.sin(0.3), 0.0])
    np.testing.assert_allclose(shift, 0.1 * axis_w, atol=1e-5)

    x0, J = body_positions_and_jacobians(robot, q)
    J = np.asarray(J)
    h = 1e-3
    for i in range(3):
        dq = jnp.zeros(3).at[i].set(h)
        xp = np.asarray(body_positions(robot, q + dq))
        xm = np.asarray(body_positions(robot, q - dq))
        np.testing.assert_allclose(J[:, :, i], (xp - xm) / (2 * h), atol=2e-3)
