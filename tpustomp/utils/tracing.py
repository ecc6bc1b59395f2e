"""Tracing / profiling / debug helpers.

Reference equivalents (SURVEY §6): `ros::WallTime` stopwatches and
per-iteration `ROS_INFO` cost prints; no sanitizers (single-threaded C++).

Here:
  - `named_scope`: `jax.named_scope` wrappers are applied at the solver's
    stage boundaries so device profiles group by sample/FK/SDF/update.
  - `profile()`: context manager around `jax.profiler.trace` writing a
    TensorBoard-loadable trace directory.
  - `debug_mode()`: context manager enabling NaN checking
    (`jax.debug_nans`) — the CI-grade numeric sanitizer for jitted code.
  - `checked_solve`: a `checkify`-wrapped solver entry that surfaces
    NaN/OOB errors as Python exceptions in debug builds (SURVEY §6 race-
    detection row — the on-device analogue of a sanitizer).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile(logdir: str = "/tmp/tpustomp_trace"):
    """Capture a device profile: `with profile(): plan(...)` then load the
    directory in TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode():
    """Enable NaN debugging for the enclosed computations."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked_solve(robot, world, constraints, cfg, ops, q0, qN, key):
    """checkify-instrumented solve: raises on NaN/inf division instead of
    silently propagating (debug builds only — adds ~2x overhead)."""
    from jax.experimental import checkify

    from tpustomp.engine import solver

    fn = checkify.checkify(
        lambda *a: solver.solve(robot, world, constraints, cfg, ops, *a),
        errors=checkify.float_checks)
    err, sol = jax.jit(fn)(q0, qN, key)
    err.throw()
    return sol
