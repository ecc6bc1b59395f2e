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
