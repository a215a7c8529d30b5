"""Fixed-capacity keyframe store as structure-of-arrays tensors.

Capability parity (SURVEY.md §3.1 "Keyframe manager"): the reference keeps a
growing list of (scan, pose) keyframes used for loop closure. Here the store
is a static-shape SoA pytree — poses ``[K, 3]``, scans ``[K, N, 2]``, masks
``[K, N]``, live-slot mask — so it can ride inside jitted update steps and be
sharded across devices (keyframe-axis sharding, SURVEY.md §3.3).

Appends are masked writes (SURVEY.md §8 hard part #1: capacity padding);
overflow drops the append and leaves the store unchanged, which callers can
detect by comparing ``n`` before/after.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["KeyframeStore", "empty_store", "add_keyframe"]


class KeyframeStore(NamedTuple):
    poses: jax.Array    # [K, 3] world-from-keyframe transforms
    points: jax.Array   # [K, N, 2] sensor-frame scan points
    masks: jax.Array    # [K, N] beam validity
    live: jax.Array     # [K] bool — slot holds a real keyframe
    n: jax.Array        # [] int32 — number of live keyframes
    # Optional per-keyframe local NDT quad table [K, R, L] (sensor frame, so
    # pose-independent — built once at creation, never invalidated; see
    # ndtpu.loop.closure.build_local_table). None when loop closure is off.
    tables: jax.Array | None = None

    @property
    def capacity(self) -> int:
        return self.poses.shape[0]


def empty_store(capacity: int, n_beams: int, dtype=jnp.float32,
                table_shape: tuple[int, int] | None = None) -> KeyframeStore:
    """``table_shape=(rows, lanes)`` allocates the per-keyframe local-map
    cache (:func:`ndtpu.loop.closure.local_table_shape`)."""
    return KeyframeStore(
        poses=jnp.zeros((capacity, 3), dtype),
        points=jnp.zeros((capacity, n_beams, 2), dtype),
        masks=jnp.zeros((capacity, n_beams), bool),
        live=jnp.zeros((capacity,), bool),
        n=jnp.asarray(0, jnp.int32),
        tables=(None if table_shape is None
                else jnp.zeros((capacity,) + tuple(table_shape), dtype)),
    )


def add_keyframe(kf: KeyframeStore, pose, points, mask,
                 enabled=True, table=None) -> KeyframeStore:
    """Masked append; ``enabled`` may be a traced bool (keyframe gating)."""
    enabled = jnp.asarray(enabled)
    slot = jnp.minimum(kf.n, kf.capacity - 1)
    ok = enabled & (kf.n < kf.capacity)

    def put(arr, val):
        val = jnp.asarray(val, arr.dtype)
        return arr.at[slot].set(jnp.where(ok, val, arr[slot]))

    return KeyframeStore(
        poses=put(kf.poses, pose),
        points=put(kf.points, points),
        masks=put(kf.masks, mask),
        live=kf.live.at[slot].set(ok | kf.live[slot]),
        n=kf.n + ok.astype(jnp.int32),
        tables=(kf.tables if (kf.tables is None or table is None)
                else put(kf.tables, table)),
    )
