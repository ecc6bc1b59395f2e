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
