"""Spawn a real 2-process jax.distributed run on localhost (SURVEY §5.5)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_solve(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"proc{pid}.txt"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        try:
            _, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        assert p.returncode == 0, err.decode()[-2000:]
    for out in outs:
        assert out.read_text() == "OK"
