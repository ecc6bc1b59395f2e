"""CHOMP gradient verification at 7-DOF (VERDICT r1 item 5).

The round-1 suite only checked the functional gradient on a planar-2R
quadratic bowl; these tests pin it down on the config-2/3 world at 7-DOF:

  1. the "exact" mode (jax.grad of the discretized cost,
     engine/chomp.exact_obstacle_gradient) matches elementwise central
     finite differences of the cost the solver monitors;
  2. the reference's functional gradient (A.11, full curvature term)
     converges to the exact discrete gradient as dt -> 0 — at the config-2
     discretization (N=100, dt~0.05) they agree to cos > 0.97, while the
     curvature-less "simple" variant does NOT (cos ~ 0.2, measured) — i.e.
     the curvature term is load-bearing at 7-DOF, not a refinement;
  3. exact mode solves a colliding problem end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpustomp.engine.chomp import (exact_obstacle_gradient,
                                   obstacle_functional_gradient)
from tpustomp.engine.trajectory import full_trajectory, min_jerk_init
from tpustomp.robot import model
from tpustomp.world.sdf import AnalyticWorld

# the config-2/3 tabletop scene and endpoints (configs/config3_chomp.yaml)
_BOXES = [((0.6, 0.0, 0.2), (0.45, 0.6, 0.25)),
          ((0.68, -0.05, 0.62), (0.06, 0.06, 0.18))]
_Q0 = [-0.6, 0.5, 0.0, -0.8, 0.0, -0.5, 0.0]
_QN = [0.4, 0.5, 0.0, -0.8, 0.0, -0.5, 0.0]


def _setup(N):
    robot = model.arm_7dof()
    world = AnalyticWorld.make(boxes=_BOXES)
    q0 = jnp.asarray(_Q0)
    qN = jnp.asarray(_QN)
    theta = min_jerk_init(q0, qN, N)
    return robot, world, q0, qN, theta


def _obstacle_cost_sum(robot, world, q0, qN, dt, clearance):
    from tpustomp.costs.obstacle import obstacle_cost

    def cost(th):
        full = full_trajectory(th, q0, qN)
        q, _ = obstacle_cost(robot, world, full, dt, clearance)
        return jnp.sum(q)

    return cost


def test_exact_gradient_matches_finite_differences_7dof():
    """jax.grad of the discretized obstacle cost == central FD, elementwise.

    N=20 keeps fp32 FD noise below the gradient scale (at N=100 the FD
    itself is the noisy side); the min-jerk path here passes through the
    tabletop boxes, so the check covers the inside-box (penetration) branch
    of the potential and the SDF, not just the quadratic shell.
    """
    N, dt, clearance = 20, 0.25, 0.05
    robot, world, q0, qN, theta = _setup(N)
    cost = _obstacle_cost_sum(robot, world, q0, qN, dt, clearance)
    assert float(cost(theta)) > 0.05  # genuinely colliding

    g = np.asarray(exact_obstacle_gradient(robot, world, theta, q0, qN, dt,
                                           clearance))
    assert np.isfinite(g).all()

    P = N * robot.num_joints
    eps = 1e-3
    eye = np.eye(P, dtype=np.float32).reshape(P, N, robot.num_joints)
    pert = np.concatenate([np.asarray(theta)[None] + eps * eye,
                           np.asarray(theta)[None] - eps * eye])
    costs = np.asarray(jax.vmap(cost)(jnp.asarray(pert)))
    g_fd = ((costs[:P] - costs[P:]) / (2 * eps)).reshape(N, robot.num_joints)

    scale = np.abs(g_fd).max()
    assert np.abs(g - g_fd).max() < 5e-3 * scale
    cos = float(np.sum(g * g_fd)
                / (np.linalg.norm(g) * np.linalg.norm(g_fd)))
    assert cos > 0.9999


def test_functional_gradient_converges_to_exact_at_config2_dt():
    """A.11 functional gradient vs the exact discrete gradient at N=100.

    Full (curvature) form: cos > 0.97 and matching magnitude — the
    continuous-time functional gradient is consistent with the discretized
    cost at the config-2 step size. Simple (no-curvature) form: measured
    cos ~ 0.22 and 5.8x magnitude at this pose — asserting < 0.8 documents
    that dropping the curvature term is NOT a benign simplification at
    7-DOF (it is the use_curvature=True default for a reason).
    """
    N, clearance = 100, 0.05
    dt = 5.0 / (N + 1)
    robot, world, q0, qN, theta = _setup(N)
    full = full_trajectory(theta, q0, qN)

    g_ex = np.asarray(exact_obstacle_gradient(robot, world, theta, q0, qN,
                                              dt, clearance))
    g_full = np.asarray(obstacle_functional_gradient(
        robot, world, full, dt, clearance, use_curvature=True))
    g_simple = np.asarray(obstacle_functional_gradient(
        robot, world, full, dt, clearance, use_curvature=False))

    def cos(a, b):
        return float(np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(g_full, g_ex) > 0.97
    ratio = np.linalg.norm(g_full) / np.linalg.norm(g_ex)
    assert 0.9 < ratio < 1.1
    assert cos(g_simple, g_ex) < 0.8


def test_chomp_exact_mode_solves_end_to_end():
    """chomp_gradient_mode="exact" plans the planar benchmark successfully."""
    from tpustomp.api.config import CostWeights, PlannerConfig
    from tpustomp.api.plan import plan
    from tpustomp.api.problem import ProblemSpec

    robot = model.planar_2r(body_radius=0.05)
    world = AnalyticWorld.make(spheres=[((1.88, 0.42, 0.0), 0.27)])
    cfg = PlannerConfig(num_timesteps=20, duration=2.1, mode="chomp",
                        learning_rate=0.25, chomp_gradient_mode="exact",
                        weights=CostWeights(obstacle=50.0, smoothness=0.1),
                        collision_clearance=0.1, max_iterations=150,
                        max_iterations_after_collision_free=3)
    sol = plan(robot, world,
               ProblemSpec(q0=jnp.asarray([-0.56, 1.65]),
                           qN=jnp.asarray([1.16, -1.46])),
               cfg, key=jax.random.PRNGKey(0))
    assert bool(sol.success)
