"""Micro-timing of the stacked frontend pieces: vmapped pack vs match.

Splits the 8.0 ms/window frontend (bench_serving_ablate level A) into
pack_quad / add_points / match_batch_packed under the 8-session vmap,
to find whether the packs ride the slow batched-gather path.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ndtpu.ndt import grid as ndt_grid
from ndtpu.ndt import match as ndt_match
from ndtpu.slam import pipeline

from bench_serving_sweep import base_cfg, make_sessions


def timeit(name, fn, *args, reps=20):
    o = fn(*args)
    jax.block_until_ready(o)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:46s} {med:7.3f} ms", flush=True)
    return med


def main():
    cfg = base_cfg()
    sessions = make_sessions()
    P8 = jnp.stack([sq.points[:9] for sq in sessions])   # [S, 9, N, 2]
    M8 = jnp.stack([sq.mask[:9] for sq in sessions])
    O8 = jnp.stack([sq.odom[:9] for sq in sessions])
    state8 = jax.vmap(lambda p, m: pipeline.init_slam(cfg, p, m))(
        P8[:, 0], M8[:, 0])
    compact = cfg.match.compact_table

    pack1 = jax.jit(jax.vmap(lambda st: ndt_grid.pack_quad(
        ndt_grid.finalize(st, cfg.ndt), cfg.grid, compact=compact)))
    timeit("vmap8 finalize+pack_quad", pack1, state8.stats)

    pack_single = jax.jit(lambda st: ndt_grid.pack_quad(
        ndt_grid.finalize(st, cfg.ndt), cfg.grid, compact=compact))
    t1 = pack_single(jax.tree_util.tree_map(lambda a: a[0], state8.stats))
    timeit("single finalize+pack_quad", pack_single,
           jax.tree_util.tree_map(lambda a: a[0], state8.stats))

    add1 = jax.jit(jax.vmap(lambda st, p, m: ndt_grid.add_points(
        st, p.reshape(-1, 2), m.reshape(-1), cfg.grid)))
    timeit("vmap8 add_points (8 scans)", add1, state8.stats,
           P8[:, 1:], M8[:, 1:])

    T8 = pack1(state8.stats)
    inits = jnp.zeros((8, 8, 3), P8.dtype)
    mb = jax.jit(jax.vmap(lambda p, m, t, i: ndt_match.match_batch_packed(
        p, m, t, i, cfg.grid, cfg.match)))
    r = mb(P8[:, 1:], M8[:, 1:], T8, inits)
    timeit("vmap8 match_batch_packed [8x8 lanes]", mb,
           P8[:, 1:], M8[:, 1:], T8, inits)

    # flat-lane alternative: one 64-lane match against PER-LANE tables via
    # the flat row-fold (what detect_loops_cached_flat does)
    fr = jax.jit(lambda st, lk, p, m, d: jax.vmap(
        lambda s, l, pp, mm, dd: pipeline._window_frontend(
            s, l, pp, mm, dd, cfg, cfg.window_passes))(st, lk, p, m, d))
    o = fr(state8, state8.pose, P8[:, 1:], M8[:, 1:], O8[:, 1:])
    timeit("vmap8 FULL 2-pass frontend", fr, state8, state8.pose,
           P8[:, 1:], M8[:, 1:], O8[:, 1:])

    fr1 = jax.jit(lambda st, lk, p, m, d: jax.vmap(
        lambda s, l, pp, mm, dd: pipeline._window_frontend(
            s, l, pp, mm, dd, cfg, 1))(st, lk, p, m, d))
    o = fr1(state8, state8.pose, P8[:, 1:], M8[:, 1:], O8[:, 1:])
    timeit("vmap8 1-pass frontend", fr1, state8, state8.pose,
           P8[:, 1:], M8[:, 1:], O8[:, 1:])


if __name__ == "__main__":
    main()
