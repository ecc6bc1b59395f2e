"""Test harness: run everything on 8 virtual CPU devices (SURVEY §5.5).

The container's sitecustomize registers the axon (remote TPU) backend and
imports jax at interpreter startup, so setting JAX_PLATFORMS via os.environ
here is too late — the platform must be switched through jax.config before
any backend is initialized by test code.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "oracle"))

import jax  # noqa: E402

# TPUSTOMP_TPU_TESTS=1 leaves the ambient (TPU) backend in place so the
# `tpu`-marked hardware gate tests can run compiled Mosaic kernels:
#   TPUSTOMP_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
# Default (driver CI): everything on 8 virtual CPU devices; tpu-marked
# tests skip themselves (platform is cpu).
_TPU_MODE = os.environ.get("TPUSTOMP_TPU_TESTS") == "1"
if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

if not _TPU_MODE:
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
