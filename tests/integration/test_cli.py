"""CLI runner (the reference node analogue) on the shipped YAML configs."""

import json
import os

import pytest

from tpustomp.cli import main

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "..", "configs")


def test_cli_config1(capsys):
    rc = main([os.path.join(CONFIGS, "config1_planar.yaml"), "--seed", "0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["success"] is True
    assert out["iterations"] > 0


def test_cli_config1_chomp(capsys):
    rc = main([os.path.join(CONFIGS, "config1_planar.yaml"),
               "--mode", "chomp"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # CHOMP with config-1's STOMP-tuned weights may or may not solve this
    # scene; the contract here is clean execution + well-formed output
    assert set(out) >= {"success", "iterations", "cost", "wall_seconds"}


def test_cli_config2_grid(capsys):
    rc = main([os.path.join(CONFIGS, "config2_tabletop.yaml"), "--grid"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["success"] is True


def test_cli_config4_batch(capsys):
    """BASELINE config 4 from the CLI: sharded scenario batch."""
    rc = main([os.path.join(CONFIGS, "config4_batch.yaml"),
               "--scenarios", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["num_scenarios"] == 8
    assert out["success_rate"] > 0.5


def test_cli_config5_mpc(capsys):
    """BASELINE config 5 from the CLI: moving-obstacle MPC loop (tiny)."""
    import yaml

    path = os.path.join(CONFIGS, "config5_mpc.yaml")
    with open(path) as f:
        doc = yaml.safe_load(f)
    doc["mpc"]["ticks"] = 10
    small = os.path.join(os.path.dirname(__file__), "_cfg5_small.yaml")
    with open(small, "w") as f:
        yaml.safe_dump(doc, f)
    try:
        rc = main([small, "--scenarios", "8"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert out["scenarios"] == 8 and out["ticks"] == 10
        assert 0.0 <= out["collision_rate"] <= 1.0
    finally:
        os.remove(small)


def test_cli_config5_mpc_grid(capsys):
    """--grid mpc: the voxel scene rides as the CompositeWorld static grid
    (round 5 — previously rejected); a coarse grid keeps the test fast."""
    import yaml

    path = os.path.join(CONFIGS, "config5_mpc.yaml")
    with open(path) as f:
        doc = yaml.safe_load(f)
    doc["mpc"]["ticks"] = 5
    doc["scene"] = {
        "robot": "arm_7dof",
        "boxes": [{"center": [0.6, 0.0, 0.2], "half": [0.45, 0.6, 0.25]}],
        "grid": {"origin": [-0.2, -1.0, 0.0], "shape": [16, 20, 12],
                 "resolution": 0.1},
        "q0": [-0.6, 0.5, 0.0, -0.8, 0.0, -0.5, 0.0],
        "qN": [0.4, 0.5, 0.0, -0.8, 0.0, -0.5, 0.0],
    }
    small = os.path.join(os.path.dirname(__file__), "_cfg5_grid_small.yaml")
    with open(small, "w") as f:
        yaml.safe_dump(doc, f)
    try:
        rc = main([small, "--grid", "--scenarios", "8"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert out["scenarios"] == 8 and out["ticks"] == 5
        assert "reached_rate" in out and "median_ticks_to_goal" in out
    finally:
        os.remove(small)


def test_cli_mpc_grid_keeps_scene_spheres_as_movers(capsys, monkeypatch):
    """--grid mpc: the scene's spheres must remain the per-scenario MOVING
    obstacles (the function's contract) while only the static boxes are
    voxelized — round-5 fix: previously the whole scene (spheres included)
    was frozen into the grid and a spurious default mover launched."""
    import yaml
    import numpy as np
    from tpustomp.engine import mpc as mpc_mod
    from tpustomp.world.sdf import GridSDF

    captured = {}

    def spy(robot, cfg, states, radius, ticks, world_dt, **kw):
        captured["states"] = states
        captured["radius"] = np.asarray(radius)
        captured["static_world"] = kw.get("static_world")
        return states  # skip the solve; the CLI only summarizes fields

    monkeypatch.setattr(mpc_mod, "run_mpc_sharded", spy)

    sphere_c = [0.9, 0.5, 0.45]
    box_c = [0.6, 0.0, 0.2]
    doc = {
        "planner": {"num_timesteps": 10, "num_rollouts": 4,
                    "max_iterations": 2},
        "scene": {
            "robot": "arm_7dof",
            "spheres": [{"center": sphere_c, "radius": 0.2}],
            "boxes": [{"center": box_c, "half": [0.3, 0.4, 0.2]}],
            "grid": {"origin": [-0.2, -1.0, 0.0], "shape": [16, 20, 12],
                     "resolution": 0.1},
            "q0": [-0.6, 0.5, 0.0, -0.8, 0.0, -0.5, 0.0],
            "qN": [0.4, 0.5, 0.0, -0.8, 0.0, -0.5, 0.0],
        },
        "mpc": {"scenarios": 4, "ticks": 3, "world_dt": 0.1,
                "obstacle_speed": 0.2},
    }
    small = os.path.join(os.path.dirname(__file__), "_cfg5_spheres.yaml")
    with open(small, "w") as f:
        yaml.safe_dump(doc, f)
    try:
        rc = main([small, "--grid", "--scenarios", "4"])
        assert rc == 0
        json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    finally:
        os.remove(small)

    # the scene sphere is the mover, not a default at [0.9, 0.6, 0.5]
    centers = np.asarray(captured["states"].sphere_center)  # [B, S, 3]
    assert centers.shape[1:] == (1, 3)
    np.testing.assert_allclose(centers[0, 0], sphere_c, atol=1e-6)
    np.testing.assert_allclose(captured["radius"], [0.2])

    gw = captured["static_world"]
    assert isinstance(gw, GridSDF)
    # sphere region NOT frozen into the static grid (positive distance at
    # its center voxel), while the box region is inside (negative)
    def vox(p):
        idx = np.round((np.asarray(p) - np.asarray(gw.origin))
                       / float(gw.resolution)).astype(int)
        return float(np.asarray(gw.grid)[tuple(idx)])

    assert vox(sphere_c) > 0.0
    assert vox(box_c) < 0.0
