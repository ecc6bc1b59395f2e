"""Fused Pallas rollout kernel vs the XLA cost path (interpret mode on CPU;
the compiled kernel is validated on TPU hardware in bench runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpustomp.costs.obstacle as obst
import tpustomp.kernels.rollout_pallas as rp
from tpustomp.robot import model
from tpustomp.world.sdf import AnalyticWorld


@pytest.mark.parametrize("robot_name", ["arm_7dof", "planar_2r"])
def test_kernel_matches_xla_path(robot_name):
    robot = getattr(model, robot_name)()
    world = AnalyticWorld.make(
        boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25))],
        spheres=[((0.3, 0.3, 0.9), 0.1), ((1.2, -0.4, 0.0), 0.3)])
    T = 34
    d = robot.num_joints
    C = 24  # deliberately not a tile multiple: exercises padding
    dt, clearance = 0.05, 0.08
    rng = np.random.default_rng(0)
    cand = rng.uniform(-1.2, 1.2, (C, T, d)).astype(np.float32)

    q_obs, margin = rp.obstacle_cost_batch_pallas(
        robot, world, jnp.asarray(cand), dt, clearance, interpret=True)

    for c in range(0, C, max(1, C // 5)):
        q_ref, m_ref = obst.obstacle_cost(robot, world, jnp.asarray(cand[c]),
                                          dt, clearance)
        np.testing.assert_allclose(np.asarray(q_obs[c]), np.asarray(q_ref),
                                   atol=2e-6)
        assert abs(float(margin[c]) - float(m_ref)) < 1e-6


def test_unrolled_matches_rolled_fallback():
    """The scratch-free unrolled kernel (static body partition, axis-
    specialized via RobotSpec.joint_static) and the rolled/staged fallback
    agree to ULP level UNDER INTERPRET MODE: specialization shortens the
    FK sum trees, which changes XLA CPU's FMA-contraction choices —
    ~1 ULP per composed joint (≤4e-6 abs on this 7-joint chain; exact for
    single-axis chains). On real TPU the specialized kernel is bitwise-
    identical to the general one (Mosaic does not contract FMAs; measured
    diff 0.0 — docs/PERFORMANCE.md round 4). With specialization disabled
    the two kernels are bitwise-identical here too, asserted below."""
    import dataclasses

    robot = model.arm_7dof()
    assert robot.body_counts is not None
    rolled_robot = dataclasses.replace(robot, body_counts=None)
    world = AnalyticWorld.make(
        boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25))],
        spheres=[((0.3, 0.3, 0.9), 0.1)])
    rng = np.random.default_rng(7)
    cand = jnp.asarray(rng.uniform(-1.2, 1.2, (16, 22, 7)), jnp.float32)
    q_u, m_u = rp.obstacle_cost_batch_pallas(robot, world, cand, 0.05, 0.08,
                                             interpret=True)
    q_r, m_r = rp.obstacle_cost_batch_pallas(rolled_robot, world, cand,
                                             0.05, 0.08, interpret=True)
    np.testing.assert_allclose(np.asarray(q_u), np.asarray(q_r),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_u), np.asarray(m_r),
                               atol=2e-6)
    # unspecialized unrolled == rolled, bitwise (the pre-round-4 contract)
    general = dataclasses.replace(robot, joint_static=None)
    q_g, m_g = rp.obstacle_cost_batch_pallas(general, world, cand,
                                             0.05, 0.08, interpret=True)
    np.testing.assert_array_equal(np.asarray(q_g), np.asarray(q_r))
    np.testing.assert_array_equal(np.asarray(m_g), np.asarray(m_r))


def test_supports_flags():
    import dataclasses
    robot = model.planar_2r()
    world = AnalyticWorld.make(spheres=[((0, 0, 0), 0.1)])
    assert rp.supports(robot, world)
    prism = dataclasses.replace(robot, joint_type=jnp.asarray([1, 0]))
    assert rp.supports(prism, world)
    from tpustomp.world import edt
    grid = edt.signed_edt(np.ones((4, 4, 4), bool), 0.1, (0, 0, 0))
    assert rp.supports(robot, grid)
    assert not rp.supports(robot, object())


def test_kernel_matches_xla_path_prismatic():
    """RPR chain with a prismatic joint AND non-identity fixed rotations
    through the fused analytic kernel (exercises the un-skipped rot_fixed
    multiply — built-ins all have rot_fixed_identity=True)."""
    from tpustomp.robot.fk import rodrigues
    import jax.numpy as _jnp

    rots = np.stack([
        np.asarray(rodrigues(_jnp.asarray([0.0, 0.0, 1.0]), _jnp.float32(a)))
        for a in (0.3, -0.5, 0.2)])
    robot = model._spec(
        joint_axis=[[0, 0, 1], [1, 0, 0], [0, 1, 0]],
        joint_offset=[[0, 0, 0.3], [0.4, 0, 0], [0.3, 0, 0]],
        joint_rot=rots,
        lower=[-3.0, 0.0, -3.0], upper=[3.0, 0.6, 3.0],
        limited=[True, True, True],
        joint_type=[model.REVOLUTE, model.PRISMATIC, model.REVOLUTE],
        body_link=[0, 1, 2, 2],
        body_offset=[[0.2, 0, 0], [0.1, 0, 0], [0.15, 0, 0], [0.3, 0, 0]],
        body_radius=[0.06, 0.05, 0.05, 0.04],
    )
    world = AnalyticWorld.make(
        spheres=[((0.5, 0.1, 0.4), 0.15)],
        boxes=[((0.2, -0.3, 0.2), (0.2, 0.1, 0.2))])
    T, C = 18, 10
    dt, clearance = 0.05, 0.08
    rng = np.random.default_rng(1)
    cand = rng.uniform(-1.0, 1.0, (C, T, 3)).astype(np.float32)
    cand[:, :, 1] = np.abs(cand[:, :, 1]) * 0.5   # prismatic extension >= 0

    q_obs, margin = rp.obstacle_cost_batch_pallas(
        robot, world, jnp.asarray(cand), dt, clearance, interpret=True)
    for c in range(C):
        q_ref, m_ref = obst.obstacle_cost(robot, world, jnp.asarray(cand[c]),
                                          dt, clearance)
        np.testing.assert_allclose(np.asarray(q_obs[c]), np.asarray(q_ref),
                                   atol=2e-6)
        assert abs(float(margin[c]) - float(m_ref)) < 1e-6


def test_grid_hybrid_matches_xla_path():
    """Grid worlds: fused kinematics kernel + XLA trilinear tail == XLA path."""
    from tpustomp.world import edt

    robot = model.arm_7dof()
    analytic = AnalyticWorld.make(
        boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25))],
        spheres=[((0.3, 0.3, 0.9), 0.1)])
    grid = edt.grid_from_analytic(analytic, origin=(-0.5, -1.2, -0.4),
                                  shape=(40, 44, 36), resolution=0.06)
    T, C = 26, 12
    dt, clearance = 0.05, 0.08
    rng = np.random.default_rng(2)
    cand = rng.uniform(-1.2, 1.2, (C, T, 7)).astype(np.float32)

    q_obs, margin = rp.obstacle_cost_batch_pallas(
        robot, grid, jnp.asarray(cand), dt, clearance, interpret=True)
    for c in range(0, C, 3):
        q_ref, m_ref = obst.obstacle_cost(robot, grid, jnp.asarray(cand[c]),
                                          dt, clearance)
        np.testing.assert_allclose(np.asarray(q_obs[c]), np.asarray(q_ref),
                                   atol=2e-6, rtol=1e-5)
        assert abs(float(margin[c]) - float(m_ref)) < 1e-6


def test_time_major_matches_candidate_major():
    """The lane-packed time-major layout (default for the unrolled analytic
    path; 2.46x on v5e — docs/PERFORMANCE.md) is bit-identical to the
    candidate-major layout it replaced."""
    robot = model.arm_7dof()
    world = AnalyticWorld.make(
        boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25))],
        spheres=[((0.3, 0.3, 0.9), 0.1)])
    T, d = 30, robot.num_joints
    rng = np.random.default_rng(3)
    cand = jnp.asarray(rng.uniform(-1.2, 1.2, (128, T, d)), jnp.float32)
    shapes = (d, robot.body_link.shape[0], 1, 1, T)
    kw = dict(interpret=True, skip_rotf=robot.rot_fixed_identity)
    f_cm = rp.build_unrolled_kernel(shapes, 0.05, 0.08, robot.body_counts,
                                    tile_c=64, **kw)
    f_tm = rp.build_unrolled_kernel(shapes, 0.05, 0.08, robot.body_counts,
                                    time_major=True, **kw)
    q1, m1 = f_cm(cand, robot, world)
    q2, m2 = f_tm(cand, robot, world)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_composite_hybrid_matches_xla_path():
    """CompositeWorld through the hybrid kernel path == XLA reference."""
    from tpustomp.world.edt import grid_from_analytic
    from tpustomp.world.sdf import CompositeWorld

    robot = model.arm_7dof()
    static = AnalyticWorld.make(boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25))])
    grid = grid_from_analytic(static, origin=(-0.6, -1.2, -0.4),
                              shape=(40, 44, 30), resolution=0.06)
    comp = CompositeWorld.make(grid, spheres=[((0.35, 0.3, 0.55), 0.12)])
    assert rp.supports(robot, comp)
    rng = np.random.default_rng(5)
    cand = rng.uniform(-1.2, 1.2, (12, 26, 7)).astype(np.float32)
    q_obs, margin = rp.obstacle_cost_batch_pallas(
        robot, comp, jnp.asarray(cand), 0.05, 0.08, interpret=True)
    for c in range(0, 12, 3):
        q_ref, m_ref = obst.obstacle_cost(robot, comp, jnp.asarray(cand[c]),
                                          0.05, 0.08)
        np.testing.assert_allclose(np.asarray(q_obs[c]), np.asarray(q_ref),
                                   atol=2e-6)
        assert abs(float(margin[c]) - float(m_ref)) < 2e-6


def test_per_candidate_worlds_match_per_candidate_xla():
    """per_cand_world: each candidate evaluated against ITS OWN analytic
    primitives (the flat execution form of per-scenario MPC worlds) must
    match the XLA path run candidate-by-candidate with that world."""
    robot = model.arm_7dof()
    T, d, C = 30, robot.num_joints, 10
    dt, clearance = 0.05, 0.08
    rng = np.random.default_rng(3)
    cand = jnp.asarray(rng.uniform(-1.2, 1.2, (C, T, d)), jnp.float32)
    centers = jnp.asarray(rng.uniform(-0.8, 0.8, (C, 2, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.05, 0.3, (C, 2)), jnp.float32)
    bc = jnp.asarray(rng.uniform(-0.8, 0.8, (C, 1, 3)), jnp.float32)
    bh = jnp.asarray(rng.uniform(0.05, 0.4, (C, 1, 3)), jnp.float32)
    world_pc = AnalyticWorld(sphere_center=centers, sphere_radius=radii,
                             box_center=bc, box_half=bh)

    q_obs, margin = rp.obstacle_cost_batch_pallas(
        robot, world_pc, cand, dt, clearance, interpret=True)

    for c in range(C):
        w = AnalyticWorld(sphere_center=centers[c], sphere_radius=radii[c],
                          box_center=bc[c], box_half=bh[c])
        q_ref, m_ref = obst.obstacle_cost(robot, w, cand[c], dt, clearance)
        np.testing.assert_allclose(np.asarray(q_obs[c]), np.asarray(q_ref),
                                   atol=2e-6, err_msg=f"cand {c}")
        assert abs(float(margin[c]) - float(m_ref)) < 1e-6


def test_per_candidate_worlds_empty_boxes():
    """Per-candidate worlds with an empty primitive family use sentinel
    rows; spheres-only and boxes-only both run."""
    robot = model.planar_2r()
    T, d, C = 18, robot.num_joints, 5
    rng = np.random.default_rng(4)
    cand = jnp.asarray(rng.uniform(-1.5, 1.5, (C, T, d)), jnp.float32)
    centers = jnp.asarray(rng.uniform(-1.0, 1.0, (C, 1, 3)), jnp.float32)
    radii = jnp.asarray(np.full((C, 1), 0.2), jnp.float32)
    world_pc = AnalyticWorld(
        sphere_center=centers, sphere_radius=radii,
        box_center=jnp.zeros((C, 0, 3), jnp.float32),
        box_half=jnp.zeros((C, 0, 3), jnp.float32))
    q_obs, margin = rp.obstacle_cost_batch_pallas(
        robot, world_pc, cand, 0.05, 0.08, interpret=True)
    for c in range(C):
        w = AnalyticWorld(
            sphere_center=centers[c], sphere_radius=radii[c],
            box_center=jnp.zeros((0, 3), jnp.float32),
            box_half=jnp.zeros((0, 3), jnp.float32))
        q_ref, m_ref = obst.obstacle_cost(robot, w, cand[c], 0.05, 0.08)
        np.testing.assert_allclose(np.asarray(q_obs[c]), np.asarray(q_ref),
                                   atol=2e-6)
        assert abs(float(margin[c]) - float(m_ref)) < 1e-6


def test_activity_skip_zeros_inactive_tiles():
    """row_active: active rows bit-identical to a no-hint run; every row in
    a fully-inactive tile comes back exactly zero (never NaN). C=256 at
    tile 128 -> two tiles; second all-inactive, first mixed (the mixed tile
    must still compute ALL its rows)."""
    robot = model.arm_7dof()
    world = AnalyticWorld.make(
        boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25))],
        spheres=[((0.3, 0.3, 0.9), 0.1)])
    rng = np.random.default_rng(3)
    C, T = 256, 22
    cand = jnp.asarray(rng.uniform(-1.2, 1.2, (C, T, 7)), jnp.float32)
    active = np.zeros(C, bool)
    active[:100] = True  # tile 0 mixed-active, tile 1 fully inactive
    q_ref, m_ref = rp.obstacle_cost_batch_pallas(robot, world, cand,
                                                 0.05, 0.08, interpret=True)
    q, m = rp.obstacle_cost_batch_pallas(robot, world, cand, 0.05, 0.08,
                                         interpret=True,
                                         row_active=jnp.asarray(active))
    np.testing.assert_array_equal(np.asarray(q[:128]), np.asarray(q_ref[:128]))
    np.testing.assert_array_equal(np.asarray(m[:128]), np.asarray(m_ref[:128]))
    np.testing.assert_array_equal(np.asarray(q[128:]),
                                  np.zeros((128, T), np.float32))
    np.testing.assert_array_equal(np.asarray(m[128:]), np.zeros(128, np.float32))


def test_activity_skip_per_candidate_worlds():
    """The skip composes with per-candidate worlds (batched-MPC layout)."""
    robot = model.arm_7dof()
    rng = np.random.default_rng(5)
    C, T = 256, 22
    cand = jnp.asarray(rng.uniform(-1.0, 1.0, (C, T, 7)), jnp.float32)
    world_pc = AnalyticWorld(
        sphere_center=jnp.asarray(rng.uniform(-0.5, 0.8, (C, 2, 3)),
                                  jnp.float32),
        sphere_radius=jnp.full((C, 2), 0.1, jnp.float32),
        box_center=jnp.asarray(rng.uniform(-0.5, 0.8, (C, 1, 3)),
                               jnp.float32),
        box_half=jnp.full((C, 1, 3), 0.2, jnp.float32))
    active = np.zeros(C, bool)
    active[128:] = True  # first tile inactive, second active
    q_ref, m_ref = rp.obstacle_cost_batch_pallas(robot, world_pc, cand,
                                                 0.05, 0.08, interpret=True)
    q, m = rp.obstacle_cost_batch_pallas(robot, world_pc, cand, 0.05, 0.08,
                                         interpret=True,
                                         row_active=jnp.asarray(active))
    np.testing.assert_array_equal(np.asarray(q[128:]), np.asarray(q_ref[128:]))
    np.testing.assert_array_equal(np.asarray(q[:128]),
                                  np.zeros((128, T), np.float32))
    np.testing.assert_array_equal(np.asarray(m[:128]), np.zeros(128, np.float32))


def test_solve_batch_with_done_scenarios_matches_vmap_solve():
    """End-to-end: the sync-free done-tile skip inside solve_batch must not
    change any per-scenario result (finished scenarios' zero rows are
    discarded by the freeze mask). Pallas interpret mode so the activity
    path actually runs on CPU."""
    from tpustomp.api.config import (CostWeights, NoiseConfig, PlannerConfig)
    from tpustomp.dynamics.device import device_ops
    from tpustomp.engine import solver

    robot = model.planar_2r()
    world = AnalyticWorld.make(spheres=[((1.2, 0.6, 0.0), 0.3)])
    cfg = PlannerConfig(
        num_timesteps=20, duration=1.0, num_rollouts=8, max_iterations=30,
        noise=NoiseConfig(stddev=0.25, decay=0.99, num_rollouts_reused=2),
        weights=CostWeights(obstacle=1.0, smoothness=0.05),
        collision_clearance=0.05, max_iterations_after_collision_free=2,
        obstacle_backend="pallas", pallas_interpret=True,
        record_metrics=False)
    rng = np.random.default_rng(11)
    B = 6
    Q0 = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 2)), jnp.float32)
    QN = jnp.asarray(np.pi / 2 + rng.uniform(-1.0, 1.0, (B, 2)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    ops = device_ops(cfg.num_timesteps, cfg.dt, cfg.smoothness)

    got = solver.solve_batch(robot, world, None, cfg, ops, Q0, QN, keys)
    ref = jax.vmap(lambda a, b, k: solver.solve(
        robot, world, None, cfg, ops, a, b, k))(Q0, QN, keys)
    its = np.asarray(got.iterations)
    assert len(set(its.tolist())) > 1, "need staggered convergence"
    # Exact success/iteration equality is intentional: on the XLA CPU path
    # the tm step reduces over the same axes as vmap(solve), so discrete
    # outcomes should not differ at all. The two layouts CAN differ at ULP
    # level (different dot tilings), so a near-threshold seed could in
    # principle flip a margin comparison; this seed (PRNGKey(2), rng 11)
    # was checked to converge with healthy margins. If it ever flakes,
    # compare against solve_batch under TPUSTOMP_PALLAS_LAYOUT=cm instead
    # of vmap(solve) — same layout, bitwise-stable.
    np.testing.assert_array_equal(np.asarray(got.success),
                                  np.asarray(ref.success))
    np.testing.assert_array_equal(np.asarray(got.iterations),
                                  np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(got.trajectory),
                               np.asarray(ref.trajectory),
                               rtol=1e-5, atol=1e-6)


def test_ee_output_matches_fk_frames():
    """ee_out rows (kernel EE frame) must equal fk_frames' last-joint frame
    for every candidate/waypoint (interpret mode; fp32 tolerance)."""
    from tpustomp.robot.fk import fk_frames

    robot = model.arm_7dof()
    world = AnalyticWorld.make(spheres=[((0.5, 0.2, 0.5), 0.15)])
    C, T = 128, 12
    rng = np.random.default_rng(5)
    cand = jnp.asarray(rng.uniform(-1.2, 1.2, (C, T, 7)), jnp.float32)
    q_obs, margin, ee = rp.obstacle_cost_batch_pallas(
        robot, world, cand, 0.05, 0.08, interpret=True, want_ee=True)
    assert ee.shape == (12, T, C)

    def ref_frame(q):
        pos, rot, _ = fk_frames(robot, q)
        return jnp.concatenate([pos[-1], rot[-1].reshape(9)])

    ref = jax.vmap(jax.vmap(ref_frame))(cand)          # [C, T, 12]
    np.testing.assert_allclose(np.asarray(jnp.transpose(ee, (2, 1, 0))),
                               np.asarray(ref), rtol=1e-5, atol=2e-5)
    # the q_obs/margin outputs are unchanged by asking for ee
    q2, m2 = rp.obstacle_cost_batch_pallas(robot, world, cand, 0.05, 0.08,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(q_obs), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(margin), np.asarray(m2))


def test_constrained_solve_batch_stays_on_tm_path_and_matches_xla():
    """Frame-evaluable constraints must keep solve_batch on the fused
    time-major path (VERDICT r4 item 3c) and agree with the XLA backend's
    constrained solve (same math through different FK implementations)."""
    from tpustomp.api.config import CostWeights, NoiseConfig, PlannerConfig
    from tpustomp.costs.constraints import OrientationConstraint
    from tpustomp.dynamics.device import device_ops
    from tpustomp.engine import solver

    robot = model.arm_7dof()
    world = AnalyticWorld.make(
        boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25))])
    cons = OrientationConstraint.make(axis_local=(0, 0, 1),
                                      target_world=(0, 0, 1),
                                      tolerance=0.3, weight=1.0)
    assert solver._tm_step_eligible(
        robot, world, cons, PlannerConfig(obstacle_backend="pallas"))
    assert not solver._tm_step_eligible(
        robot, world, object(), PlannerConfig(obstacle_backend="pallas"))

    cfg_p = PlannerConfig(
        num_timesteps=16, duration=1.5, num_rollouts=8, max_iterations=12,
        noise=NoiseConfig(stddev=0.15, decay=0.99, num_rollouts_reused=2),
        weights=CostWeights(obstacle=1.0, smoothness=0.05, constraint=1.0),
        collision_clearance=0.05, max_iterations_after_collision_free=2,
        obstacle_backend="pallas", pallas_interpret=True,
        record_metrics=False)
    cfg_x = cfg_p.replace(obstacle_backend="xla")
    rng = np.random.default_rng(3)
    B = 4
    Q0 = jnp.asarray(np.tile([-0.6, 0.5, 0.0, -0.8, 0.0, -0.5, 0.0], (B, 1))
                     + rng.uniform(-0.05, 0.05, (B, 7)), jnp.float32)
    QN = jnp.asarray(np.tile([0.4, 0.5, 0.0, -0.8, 0.0, -0.5, 0.0], (B, 1))
                     + rng.uniform(-0.05, 0.05, (B, 7)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    ops = device_ops(cfg_p.num_timesteps, cfg_p.dt, cfg_p.smoothness)

    got = solver.solve_batch(robot, world, cons, cfg_p, ops, Q0, QN, keys)
    ref = solver.solve_batch(robot, world, cons, cfg_x, ops, Q0, QN, keys)
    np.testing.assert_array_equal(np.asarray(got.success),
                                  np.asarray(ref.success))
    np.testing.assert_allclose(np.asarray(got.trajectory),
                               np.asarray(ref.trajectory),
                               rtol=1e-4, atol=1e-4)


def test_grid_finish_scan_matches_vectorized(monkeypatch):
    """The body-axis scan used above _GRID_SCAN_THRESHOLD (OOM guard for
    large batches) must reproduce the vectorized tail."""
    from tpustomp.world import edt

    robot = model.arm_7dof()
    world = AnalyticWorld.make(boxes=[((0.6, 0.0, 0.2), (0.45, 0.6, 0.25))])
    grid = edt.grid_from_analytic(world, (-0.6, -1.2, -0.4), (40, 40, 30),
                                  0.05)
    rng = np.random.default_rng(9)
    cand = jnp.asarray(rng.uniform(-1.2, 1.2, (16, 22, 7)), jnp.float32)
    q_vec, m_vec = rp.obstacle_cost_batch_pallas(robot, grid, cand,
                                                 0.05, 0.08, interpret=True)
    monkeypatch.setattr(rp, "_GRID_SCAN_THRESHOLD", 0)
    q_scan, m_scan = rp.obstacle_cost_batch_pallas(robot, grid, cand,
                                                   0.05, 0.08, interpret=True)
    np.testing.assert_allclose(np.asarray(q_scan), np.asarray(q_vec),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_scan), np.asarray(m_vec),
                               rtol=1e-6, atol=1e-6)

    # per-candidate overlay (MPC form) through the scan as well
    from tpustomp.world.sdf import CompositeWorld
    C = cand.shape[0]
    overlay = AnalyticWorld(
        sphere_center=jnp.asarray(rng.uniform(-0.5, 0.9, (C, 1, 3)),
                                  jnp.float32),
        sphere_radius=jnp.full((C, 1), 0.15, jnp.float32),
        box_center=jnp.zeros((C, 0, 3), jnp.float32),
        box_half=jnp.zeros((C, 0, 3), jnp.float32))
    comp = CompositeWorld(grid=grid, overlay=overlay)
    q_scan2, m_scan2 = rp.obstacle_cost_batch_pallas(
        robot, comp, cand, 0.05, 0.08, interpret=True)
    monkeypatch.setattr(rp, "_GRID_SCAN_THRESHOLD", 8_000_000)
    q_vec2, m_vec2 = rp.obstacle_cost_batch_pallas(
        robot, comp, cand, 0.05, 0.08, interpret=True)
    np.testing.assert_allclose(np.asarray(q_scan2), np.asarray(q_vec2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_scan2), np.asarray(m_vec2),
                               rtol=1e-6, atol=1e-6)
