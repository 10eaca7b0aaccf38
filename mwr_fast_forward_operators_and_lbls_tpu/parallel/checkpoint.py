"""Checkpoint / resume for fast-operator distillation state.

The reference's only "checkpointing" is stage-level NetCDF files that let a
failed pipeline stage be rerun from the previous stage's output
(/root/reference/run_all_procs.sh:3-10; per-batch files in
RTTOV_gb_processing.py:146-147).  The forward passes of this framework are
re-runnable the same way (every CLI stage reads/writes NetCDF), so the only
stateful computation that needs intra-stage resume is distillation training —
handled here with orbax (async-capable, multi-host-safe checkpointing of the
jax pytree state), per SURVEY.md section 5.

State layout: {"params": ..., "opt_state": ..., "step": int}.  Restore uses
abstract targets from a freshly-initialized state so shardings/dtypes follow
the current mesh, which makes checkpoints portable across topology changes
(train on one host, resume on a pod slice).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:  # orbax is in the baked image; degrade to .npz if it ever is not.
    import orbax.checkpoint as ocp
    HAVE_ORBAX = True
except Exception:  # pragma: no cover
    ocp = None
    HAVE_ORBAX = False


def save(path: str, state: dict, force: bool = True) -> None:
    """Write a train-state pytree checkpoint at `path` (a directory)."""
    path = os.path.abspath(path)
    if HAVE_ORBAX:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, state, force=force)
        return
    os.makedirs(path, exist_ok=True)  # pragma: no cover - fallback
    flat, treedef = jax.tree.flatten(state)
    np.savez(os.path.join(path, "state.npz"),
             treedef=np.frombuffer(str(treedef).encode(), np.uint8),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def restore(path: str, like: dict) -> dict:
    """Restore a checkpoint into the structure/shardings of `like`.

    `like` is a template state (e.g. freshly initialized on the current
    mesh); returned arrays adopt its shapes, dtypes, and shardings.
    """
    path = os.path.abspath(path)
    if HAVE_ORBAX:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path, abstract)
    data = np.load(os.path.join(path, "state.npz"))  # pragma: no cover
    flat, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(
        treedef, [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(flat))])


def exists(path: str) -> bool:
    """True if `path` holds a restorable checkpoint."""
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return False
    if HAVE_ORBAX:
        try:
            return bool(os.listdir(path))
        except OSError:
            return False
    return os.path.exists(os.path.join(path, "state.npz"))  # pragma: no cover


def latest_step(state: dict) -> int:
    step = state.get("step", 0)
    return int(np.asarray(step))


class CheckpointManager:
    """Rolling every-N-steps checkpointer for a training loop.

    Usage:
        mgr = CheckpointManager(dir, every=100)
        state = mgr.restore_or(init_state)      # resume if a ckpt exists
        for ...:
            state = train(...)
            mgr.maybe_save(state)
    """

    def __init__(self, directory: str, every: int = 100, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.every = every
        self.keep = keep

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def steps(self) -> list:
        if not os.path.isdir(self.directory):
            return []
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    out.append(int(name[5:]))
                except ValueError:
                    continue
        return sorted(out)

    def restore_or(self, init_state: dict) -> dict:
        steps = self.steps()
        if not steps:
            return init_state
        return restore(self._step_dir(steps[-1]), init_state)

    def maybe_save(self, state: Any) -> bool:
        step = latest_step(state)
        if self.every and step % self.every:
            return False
        save(self._step_dir(step), state)
        for old in self.steps()[:-self.keep]:
            _rmtree(self._step_dir(old))
        return True


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
