"""Offline visualization — the RViz-marker replacement.

Reference equivalent (SURVEY §6 tracing row): the reference publishes
`visualization_msgs::MarkerArray` topics and animates the optimizer's path in
RViz (`animate_path` / `animate_endeffector` params). Here the same roles are
matplotlib figure dumps produced on host from Solution pytrees — nothing in
the device hot path.
"""

from __future__ import annotations

import numpy as np

from tpustomp.robot.fk import body_positions_traj
from tpustomp.robot.model import RobotSpec


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_planar(robot: RobotSpec, solution, world=None, path="trajectory.png",
                link_lengths=(1.0, 1.0)):
    """Top-down view of a planar-arm solution: arm poses + EE path + obstacles."""
    plt = _mpl()
    traj = np.asarray(solution.trajectory)
    pos = np.asarray(body_positions_traj(robot, solution.trajectory))
    fig, ax = plt.subplots(figsize=(6, 6))
    for t in range(0, len(traj), max(1, len(traj) // 12)):
        q = traj[t]
        l1, l2 = link_lengths
        pts = np.array([[0, 0],
                        [l1 * np.cos(q[0]), l1 * np.sin(q[0])],
                        [l1 * np.cos(q[0]) + l2 * np.cos(q[0] + q[1]),
                         l1 * np.sin(q[0]) + l2 * np.sin(q[0] + q[1])]])
        ax.plot(pts[:, 0], pts[:, 1], "-o", color="gray", alpha=0.4, ms=2)
    ax.plot(pos[:, -1, 0], pos[:, -1, 1], "b-", lw=2, label="EE path")
    if world is not None and getattr(world, "sphere_radius", None) is not None:
        centers = np.asarray(world.sphere_center)
        radii = np.asarray(world.sphere_radius)
        for c, r in zip(centers, radii):
            ax.add_patch(plt.Circle((c[0], c[1]), r, color="r", alpha=0.3))
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(f"success={bool(solution.success)} "
                 f"cost={float(solution.cost):.3f} "
                 f"iters={int(solution.iterations)}")
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_metrics(solution, path="metrics.png"):
    """Per-iteration cost breakdown curves (the ROS_INFO log, as a figure)."""
    plt = _mpl()
    m = solution.metrics
    if m is None:
        raise ValueError("Solution recorded no metrics (record_metrics=False)")
    n = int(solution.iterations)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(np.asarray(m.total_cost)[:n], label="total")
    ax.plot(np.asarray(m.obstacle_cost)[:n], label="obstacle")
    ax.plot(np.asarray(m.smoothness_cost)[:n], label="smoothness (unweighted)")
    cf = np.asarray(m.collision_free)[:n]
    if cf.any():
        ax.axvline(int(np.argmax(cf)), color="g", ls="--",
                   label="first collision-free")
    ax.set_xlabel("iteration")
    ax.set_ylabel("cost")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_ee_path_3d(robot: RobotSpec, solution, world=None,
                    path="ee_path.png"):
    """3-D end-effector path with obstacle boxes/spheres (7-DOF scenes)."""
    plt = _mpl()
    pos = np.asarray(body_positions_traj(robot, solution.trajectory))
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    ax.plot(pos[:, -1, 0], pos[:, -1, 1], pos[:, -1, 2], "b-", lw=2)
    for b in range(pos.shape[1]):
        ax.plot(pos[:, b, 0], pos[:, b, 1], pos[:, b, 2], color="gray",
                alpha=0.3, lw=0.5)
    if world is not None and getattr(world, "box_half", None) is not None:
        centers = np.asarray(world.box_center)
        halves = np.asarray(world.box_half)
        for c, h in zip(centers, halves):
            for sx in (-1, 1):
                for sy in (-1, 1):
                    ax.plot([c[0] + sx * h[0]] * 2, [c[1] + sy * h[1]] * 2,
                            [c[2] - h[2], c[2] + h[2]], "r-", alpha=0.5)
    ax.set_title(f"success={bool(solution.success)}")
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def animate_trajectory(robot: RobotSpec, solution, world=None,
                       path="trajectory.gif", fps=15, max_frames=60):
    """Animated sweep of the solved trajectory (GIF) — the closest analogue
    of the reference's RViz `animate_path`: the robot's collision bodies
    step through the waypoints while the end-effector traces its path.

    Works for any chain (uses FK body positions, not link drawings):
    3-D scatter of the body spheres per frame + accumulated EE trace +
    world primitives. Frames are subsampled to `max_frames`. Returns the
    written path. Requires pillow (matplotlib's PillowWriter)."""
    plt = _mpl()
    from matplotlib.animation import FuncAnimation, PillowWriter

    pos = np.asarray(body_positions_traj(robot, solution.trajectory))
    T = pos.shape[0]
    frames = list(range(0, T, max(1, T // max_frames))) + [T - 1]

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    lo = pos.reshape(-1, 3).min(0) - 0.15
    hi = pos.reshape(-1, 3).max(0) + 0.15
    if world is not None and getattr(world, "box_half", None) is not None:
        centers = np.asarray(world.box_center)
        halves = np.asarray(world.box_half)
        for c, h in zip(centers, halves):
            for sx in (-1, 1):
                for sy in (-1, 1):
                    ax.plot([c[0] + sx * h[0]] * 2, [c[1] + sy * h[1]] * 2,
                            [c[2] - h[2], c[2] + h[2]], "r-", alpha=0.5)
    if world is not None and getattr(world, "sphere_radius", None) is not None:
        centers = np.asarray(world.sphere_center).reshape(-1, 3)
        for c in centers:
            ax.plot([c[0]], [c[1]], [c[2]], "ro", ms=8, alpha=0.5)
    ax.set_xlim(lo[0], hi[0]); ax.set_ylim(lo[1], hi[1])
    ax.set_zlim(lo[2], hi[2])
    ax.set_title(f"success={bool(solution.success)} "
                 f"iters={int(solution.iterations)}")
    bodies, = ax.plot([], [], [], "o", color="tab:blue", ms=5, alpha=0.8)
    trace, = ax.plot([], [], [], "-", color="tab:blue", lw=1.5, alpha=0.7)

    def draw(i):
        t = frames[i]
        bodies.set_data(pos[t, :, 0], pos[t, :, 1])
        bodies.set_3d_properties(pos[t, :, 2])
        trace.set_data(pos[:t + 1, -1, 0], pos[:t + 1, -1, 1])
        trace.set_3d_properties(pos[:t + 1, -1, 2])
        return bodies, trace

    anim = FuncAnimation(fig, draw, frames=len(frames), blit=False)
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return path
