"""Checkpoint / resume for long-running loops (MPC, large batch sweeps).

Reference equivalent (SURVEY §6): none — the reference only tracks
best-so-far in memory. Here solver/MPC state is a pytree, so snapshotting is
orbax-checkpoint on the host; single plans (<100 ms) never need this.
"""

from __future__ import annotations

import os

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save(path: str, state) -> None:
    """Persist any pytree state (SolverState, MPCState, Solution...)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore(path: str, template):
    """Restore a pytree saved with `save`. `template` is an example pytree
    with the right structure/shapes/dtypes (e.g. a freshly-built state)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, template)
    return ckptr.restore(path, abstract)
