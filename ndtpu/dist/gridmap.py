"""Spatially-sharded NDT grid: x-slab partition across the ``"space"`` axis.

Capability (SURVEY.md §3.3 "SP/CP analogue", §6 "Long-context"): very large
maps (multi-session merging, BASELINE config 5) shard the dense cell tensors
into contiguous x-slabs, one per device. This fills the structural role
sequence parallelism fills for transformers: local computation over an owned
shard plus a thin exchanged boundary.

Layout: slab tensors are ``[G, nx, ny, ...]`` sharded on axis 1, so each
device owns ``nx/D`` columns of every overlap grid. Three programs:

- :func:`build_slab_stats` — points replicated, each device accumulates only
  cells it owns (ownership masking). Zero communication.
- :func:`build_slab_stats_psharded` — points sharded (each device sees only
  its robot's / session's points). Points near slab borders belong to
  neighbor-owned cells, so each device accumulates into a halo-extended
  local slab and the halo columns are shipped to their owners with
  ``ppermute`` and added — the halo-exchange pattern (SURVEY.md §6).
- :func:`match_slab` — the full LM registration against the sharded map:
  per-point terms are computed on the owning device and combined with one
  13-float ``psum`` per iteration (f, g[3], H[9] are shard-additive because
  :func:`ndtpu.ndt.match.point_terms` returns raw sums).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ndtpu.config import GridConfig, MatchConfig, NDTMapConfig
from ndtpu.ndt import grid as ndt_grid
from ndtpu.ndt import match as ndt_match

__all__ = ["SlabStats", "SlabMap", "build_slab_stats",
           "build_slab_stats_psharded", "finalize_slab", "match_slab"]


class SlabStats(NamedTuple):
    """Sufficient statistics in slab layout ``[G, nx, ny, ...]`` (sharded on
    the nx axis)."""

    n: jax.Array    # [G, nx, ny]
    s: jax.Array    # [G, nx, ny, 2]
    ss: jax.Array   # [G, nx, ny, 2, 2]


class SlabMap(NamedTuple):
    mean: jax.Array   # [G, nx, ny, 2]
    icov: jax.Array   # [G, nx, ny, 2, 2]
    valid: jax.Array  # [G, nx, ny]


def _cell_xy(points, grid: GridConfig):
    """Per-overlap-grid integer cell coords ``(ix, iy, inb)`` each ``[G, N]``."""
    ids, inb = ndt_grid.cell_ids(points, grid)
    ix = ids % grid.nx
    iy = ids // grid.nx
    return ix, iy, inb


def _accum_local(points, w, ix_local, iy, nx_local, grid: GridConfig):
    """segment-sum masked points into a local slab ``[G, nx_local, ny]``."""
    g = grid.overlap
    c = nx_local * grid.ny
    seg = ix_local * grid.ny + iy       # [G, N] local flat id, ix-major
                                        # (so contiguous chunks = x-slabs)
    seg = seg + jnp.arange(g, dtype=jnp.int32)[:, None] * c
    seg = seg.reshape(-1)
    wf = w.reshape(-1)
    wp = (w[..., None] * points[None]).reshape(-1, 2)
    outer = points[:, :, None] * points[:, None, :]
    wpp = (w[..., None, None] * outer[None]).reshape(-1, 2, 2)
    n = jax.ops.segment_sum(wf, seg, num_segments=g * c)
    s = jax.ops.segment_sum(wp, seg, num_segments=g * c)
    ss = jax.ops.segment_sum(wpp, seg, num_segments=g * c)
    return SlabStats(
        n=n.reshape(g, nx_local, grid.ny),
        s=s.reshape(g, nx_local, grid.ny, 2),
        ss=ss.reshape(g, nx_local, grid.ny, 2, 2),
    )


def build_slab_stats(mesh: Mesh, points, mask, grid: GridConfig,
                     axis: str = "space") -> SlabStats:
    """Sharded map build with replicated points (ownership masking, no
    communication). Returns slab stats sharded on the nx axis."""
    d = mesh.shape[axis]
    assert grid.nx % d == 0, (grid.nx, d)
    nx_local = grid.nx // d

    def f(points, mask):
        me = jax.lax.axis_index(axis)
        x0 = me * nx_local
        ix, iy, inb = _cell_xy(points, grid)
        mine = (ix >= x0) & (ix < x0 + nx_local)
        w = (mask[None] & inb & mine).astype(points.dtype)
        return _accum_local(points, w, ix - x0, iy, nx_local, grid)

    out = shard_map(
        f, mesh=mesh, in_specs=(P(), P()),
        out_specs=SlabStats(n=P(None, axis), s=P(None, axis),
                            ss=P(None, axis)),
    )(points, mask)
    return out


def build_slab_stats_psharded(mesh: Mesh, points, mask, grid: GridConfig,
                              axis: str = "space", halo: int = 2) -> SlabStats:
    """Sharded map build with POINT-sharded input + halo exchange.

    points ``[B, N, 2]`` with the leading axis sharded over ``axis`` (e.g.
    one robot/session per device, BASELINE config 5). Each device
    accumulates into a halo-extended slab ``[G, nx_local + 2*halo, ny]``;
    halo columns are then rotated to their owning neighbor with ``ppermute``
    and added. ``halo`` columns suffice when each device's points reach at
    most ``halo`` cells past its slab boundary (callers pick halo from the
    point spread; the remainder is dropped, matching the dense build's
    out-of-bounds clipping).
    """
    d = mesh.shape[axis]
    assert grid.nx % d == 0
    nx_local = grid.nx // d
    hw = halo

    def f(pts, msk):
        me = jax.lax.axis_index(axis)
        p = pts.reshape(-1, 2)
        m = msk.reshape(-1)
        x0 = me * nx_local
        ix, iy, inb = _cell_xy(p, grid)
        ixh = ix - x0 + hw                    # halo-extended local index
        inh = (ixh >= 0) & (ixh < nx_local + 2 * hw)
        w = (m[None] & inb & inh).astype(p.dtype)
        ext = _accum_local(p, w, jnp.clip(ixh, 0, nx_local + 2 * hw - 1), iy,
                           nx_local + 2 * hw, grid)

        right = [(i, (i + 1) % d) for i in range(d)]
        left = [(i, (i - 1) % d) for i in range(d)]

        def exchange(arr):
            # Send my high-side halo to the right neighbor's low interior,
            # my low-side halo to the left neighbor's high interior.
            lo = arr[:, :hw]                   # belongs to left neighbor
            hi = arr[:, nx_local + hw:]        # belongs to right neighbor
            from_left = jax.lax.ppermute(hi, axis, right)   # their hi -> my lo
            from_right = jax.lax.ppermute(lo, axis, left)   # their lo -> my hi
            core = arr[:, hw: nx_local + hw]
            core = core.at[:, :hw].add(from_left)
            core = core.at[:, -hw:].add(from_right)
            return core

        return SlabStats(n=exchange(ext.n), s=exchange(ext.s),
                         ss=exchange(ext.ss))

    return shard_map(
        f, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=SlabStats(n=P(None, axis), s=P(None, axis),
                            ss=P(None, axis)),
    )(points, mask)


def finalize_slab(stats: SlabStats, cfg: NDTMapConfig) -> SlabMap:
    """Elementwise Gaussian finalization — shape-polymorphic, so the slab
    layout reuses the dense-map implementation and stays sharded."""
    m = ndt_grid.finalize(
        ndt_grid.NDTStats(n=stats.n, s=stats.s, ss=stats.ss), cfg)
    return SlabMap(mean=m.mean, icov=m.icov, valid=m.valid)


def match_slab(mesh: Mesh, points, mask, slab_map: SlabMap, init_pose,
               grid: GridConfig, cfg: MatchConfig, axis: str = "space",
               ) -> ndt_match.MatchResult:
    """LM registration of a (replicated) scan against the sharded map.

    Identical math to :func:`ndtpu.ndt.match.match`; each device evaluates
    the points landing in its slab and one ``psum`` per LM iteration fuses
    (f, g, H, wsum, w0sum). The while_loop carry is replicated, so every
    device takes identical accept/reject decisions bit-for-bit.
    """
    d = mesh.shape[axis]
    nx_local = grid.nx // d
    dt = points.dtype

    def sgh(pose, pts, msk, mean, icov, valid):
        me = jax.lax.axis_index(axis)
        x0 = me * nx_local
        xw, dxdphi = ndt_match.transform_terms(pose, pts)
        ix, iy, inb = _cell_xy(xw, grid)
        mine = (ix >= x0) & (ix < x0 + nx_local)
        ixl = jnp.clip(ix - x0, 0, nx_local - 1)
        gi = jnp.arange(grid.overlap, dtype=jnp.int32)[:, None]
        mean_p = mean[gi, ixl, iy]                     # [G, N, 2]
        icov_p = icov[gi, ixl, iy]                     # [G, N, 2, 2]
        val_p = valid[gi, ixl, iy]                     # [G, N]
        w0 = (val_p * (mine & inb).astype(dt)
              * msk.astype(dt)[None, :])
        f, g, h, wsum, w0sum = ndt_match.point_terms(
            pose, xw, dxdphi, mean_p, icov_p, w0, cfg)
        vec = jnp.concatenate([
            jnp.stack([f, wsum, w0sum]), g, h.reshape(-1)])
        vec = jax.lax.psum(vec, axis)
        f, wsum, w0sum = vec[0], vec[1], vec[2]
        g, h = vec[3:6], vec[6:].reshape(3, 3)
        return f, g, h, wsum / jnp.maximum(w0sum, 1.0)

    def body(pts, msk, mean, icov, valid, init):
        def local_sgh(pose):
            return sgh(pose, pts, msk, mean, icov, valid)
        return ndt_match.lm_loop(local_sgh, init.astype(dt), cfg)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(None, axis), P(None, axis), P(None, axis), P()),
        out_specs=P(),
        check_vma=True,
    )(points, mask, slab_map.mean, slab_map.icov, slab_map.valid, init_pose)
