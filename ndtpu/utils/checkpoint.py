"""Checkpoint / resume for SLAM state (SURVEY.md §6 "Checkpoint / resume").

The reference class of system relies on GTSAM's boost serialization at best;
here the entire SLAM state is already a pytree of arrays (map statistics,
keyframe SoA, factor SoA, poses, smoother scalars), so checkpointing is a
single ``orbax-checkpoint`` save and resume is reload + continue the scan
loop — deterministic replay makes this testable (same seed -> bit-identical
trajectory, see tests/test_checkpoint.py).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "restore_state", "CheckpointManager"]


def _flatten_with_paths(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_state(path: str, state: Any) -> None:
    """Save any pytree of arrays to ``path`` (a .npz file).

    Plain npz rather than an orbax directory: SLAM states are small
    (tens of MB), single-host writes suffice, and npz restores bit-exact
    without orbax's async machinery. Multi-host sharded states should
    instead gather-to-host per process (each process saves its addressable
    shards).
    """
    leaves, _ = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def restore_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`; ``like`` supplies the
    structure (and dtypes are validated against it)."""
    leaves, treedef = _flatten_with_paths(like)
    with np.load(path) as data:
        restored = []
        for i, ref in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            ref_arr = np.asarray(ref)
            if arr.shape != ref_arr.shape or arr.dtype != ref_arr.dtype:
                raise ValueError(
                    f"checkpoint leaf {i}: saved {arr.shape}/{arr.dtype} vs "
                    f"expected {ref_arr.shape}/{ref_arr.dtype}")
            restored.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, restored)


class CheckpointManager:
    """Every-K-steps checkpoint rotation (keep the newest ``keep``).

    ``prefix`` namespaces checkpoints by producer (e.g. ``ckpt_win_`` for
    windowed-mode states vs ``ckpt_scan_`` for per-scan states, whose
    pytree structures differ): a resume only ever sees checkpoints written
    by the same mode instead of failing on a structure mismatch (ADVICE
    r3).
    """

    def __init__(self, directory: str, every: int = 50, keep: int = 3,
                 prefix: str = "ckpt_"):
        self.directory = directory
        self.every = every
        self.keep = keep
        self.prefix = prefix
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"{self.prefix}{step:08d}.npz")

    def _mine(self):
        n = len(self.prefix)
        return sorted(
            f for f in os.listdir(self.directory)
            if f.startswith(self.prefix) and f.endswith(".npz")
            and f[n:n + 8].isdigit())

    def maybe_save(self, step: int, state: Any) -> bool:
        if step % self.every != 0:
            return False
        save_state(self._path(step), state)
        self._gc()
        return True

    def _gc(self) -> None:
        for f in self._mine()[: -self.keep]:
            os.remove(os.path.join(self.directory, f))

    def latest_step(self) -> int | None:
        ckpts = self._mine()
        if not ckpts:
            return None
        return int(ckpts[-1][len(self.prefix):len(self.prefix) + 8])

    def restore_latest(self, like: Any):
        step = self.latest_step()
        if step is None:
            return None, None
        return step, restore_state(self._path(step), like)
