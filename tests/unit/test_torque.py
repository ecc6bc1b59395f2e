"""RNE inverse dynamics vs the closed-form planar-2R equations of motion
(SURVEY §5.2 "RNE torques vs ... Lagrangian")."""

import numpy as np
import jax.numpy as jnp

from tpustomp.costs.torque import rne_torques, torque_cost, joint_derivatives
from tpustomp.robot import model


def closed_form_2r(q, qd, qdd, l1, l2, m1, m2, g=9.81):
    """Textbook point-mass 2R manipulator EOM, gravity along -y."""
    c2, s2 = np.cos(q[1]), np.sin(q[1])
    c1, c12 = np.cos(q[0]), np.cos(q[0] + q[1])
    M = np.array([
        [(m1 + m2) * l1**2 + m2 * l2**2 + 2 * m2 * l1 * l2 * c2,
         m2 * l2**2 + m2 * l1 * l2 * c2],
        [m2 * l2**2 + m2 * l1 * l2 * c2, m2 * l2**2],
    ])
    h = m2 * l1 * l2 * s2
    C = np.array([-h * (2 * qd[0] * qd[1] + qd[1]**2), h * qd[0]**2])
    G = np.array([(m1 + m2) * l1 * g * c1 + m2 * l2 * g * c12,
                  m2 * l2 * g * c12])
    return M @ qdd + C + G


def test_rne_matches_closed_form_2r():
    l1, l2, m1, m2 = 0.8, 0.6, 1.3, 0.7
    robot = model.planar_2r(link_lengths=(l1, l2), masses=(m1, m2))
    gravity = jnp.asarray([0.0, -9.81, 0.0], jnp.float32)
    rng = np.random.default_rng(0)
    for _ in range(8):
        q = rng.uniform(-np.pi, np.pi, 2)
        qd = rng.uniform(-2, 2, 2)
        qdd = rng.uniform(-5, 5, 2)
        tau = np.asarray(rne_torques(
            robot, jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32),
            jnp.asarray(qdd, jnp.float32), gravity))
        want = closed_form_2r(q, qd, qdd, l1, l2, m1, m2)
        np.testing.assert_allclose(tau, want, rtol=1e-4, atol=1e-4)


def test_static_gravity_torque():
    """Horizontal arm at rest: τ1 = (m1+m2) g l1 + m2 g l2, τ2 = m2 g l2."""
    robot = model.planar_2r(link_lengths=(1.0, 1.0), masses=(1.0, 1.0))
    gravity = jnp.asarray([0.0, -9.81, 0.0], jnp.float32)
    z = jnp.zeros(2)
    tau = np.asarray(rne_torques(robot, z, z, z, gravity))
    np.testing.assert_allclose(tau, [3 * 9.81, 9.81], rtol=1e-5)


def test_zero_mass_zero_torque_cost():
    robot = model.planar_2r()  # default masses = 0
    full = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (12, 2)),
                       jnp.float32)
    row = np.asarray(torque_cost(robot, full, 0.1))
    np.testing.assert_allclose(row, 0.0, atol=1e-8)


def test_joint_derivatives_linear_ramp():
    T, d = 10, 2
    dt = 0.1
    slope = np.array([1.0, -2.0])
    full = jnp.asarray(np.arange(T)[:, None] * dt * slope, jnp.float32)
    qd, qdd = joint_derivatives(full, dt)
    np.testing.assert_allclose(np.asarray(qd[1:-1]),
                               np.tile(slope, (T - 2, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(qdd[1:-1]), 0.0, atol=1e-4)
