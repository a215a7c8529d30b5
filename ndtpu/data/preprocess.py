"""Scan preprocessing beyond polar->xy: voxel-grid downsampling.

Capability parity (SURVEY.md §3.1 "Scan preprocessing": "polar->Cartesian,
max-range filtering, optional downsample"). polar->xy + range filtering live
in :func:`ndtpu.data.synth.polar_to_xy`; this module adds the optional
downsample as a static-shape, jittable mask reduction: no compaction, no
dynamic shapes — the output is the SAME ``[N, 2]`` point array with a
*thinned mask* (at most one valid point per voxel), which every downstream
API (map build, matcher) already consumes as ``(points, mask)``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["voxel_downsample"]

# Quantized coordinates are clipped to +-_HALF-1 cells around the scan's own
# frame; at a 5 cm voxel that covers +-800 m of range — far beyond any 2D
# lidar. Keeps the packed voxel id inside int32.
_HALF = 1 << 14


def voxel_downsample(points, mask, voxel: float):
    """Keep at most one valid point per ``voxel x voxel`` cell.

    points ``[..., N, 2]`` (any leading batch axes), mask ``[..., N]`` bool.
    Returns the thinned mask ``[..., N]``; the kept representative is the
    lowest-index valid point of each occupied voxel (deterministic, and for
    a radial lidar scan that is a uniform angular subsample within the cell).

    Static shapes: one quantize + sort + unsort per scan — O(N log N) with
    no host round-trip, so it fuses into the same jit as the map build.
    """
    q = jnp.clip(jnp.floor(points / voxel).astype(jnp.int32),
                 -_HALF, _HALF - 1)
    ids = (q[..., 0] + _HALF) * (2 * _HALF) + (q[..., 1] + _HALF)
    # Invalid points sort to the back under one shared sentinel; they can
    # never be chosen because the final mask re-ANDs with the input mask.
    sentinel = (2 * _HALF) * (2 * _HALF)
    ids = jnp.where(mask, ids, sentinel)
    order = jnp.argsort(ids, axis=-1, stable=True)
    s_ids = jnp.take_along_axis(ids, order, axis=-1)
    first = jnp.concatenate(
        [jnp.ones_like(s_ids[..., :1], bool),
         s_ids[..., 1:] != s_ids[..., :-1]], axis=-1)
    keep = jnp.zeros_like(first)
    keep = jnp.put_along_axis(keep, order, first, axis=-1, inplace=False)
    return keep & mask
