"""Confirm: flat [B*N] row-gather vs 2D [B, N] row-gather, and the full sgh
with a flattened gather inside. If flat wins, lookup_quad gets a reshape."""

from __future__ import annotations

import sys
import time

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ndtpu_jax_cache")

    from ndtpu.config import GridConfig, MatchConfig, NDTMapConfig
    from ndtpu.data import synth
    from ndtpu.ndt import grid as ndt_grid
    from ndtpu.ndt import match as ndt_match

    grid = GridConfig(x0=-32.0, y0=-32.0, cell=0.5, nx=128, ny=128, overlap=4)
    mcfg = MatchConfig()
    n_beams, batch = 720, 256

    world = synth.box_world(half=28.0)
    angles = synth.beam_angles(n_beams)
    map_poses = synth.rectangle_trajectory(64, half=18.0, step=1.5)
    ranges = synth.simulate_scans(world, map_poses, angles, 40.0, 0.01,
                                  jax.random.PRNGKey(0))
    mpts, mmsk = synth.polar_to_xy(ranges, angles, 0.1, 40.0)
    wp = synth.se2.transform(map_poses, mpts)
    stats = ndt_grid.build_stats(wp.reshape(-1, 2), mmsk.reshape(-1), grid)
    ndt_map = ndt_grid.finalize(stats, NDTMapConfig())
    table = jax.jit(lambda m: ndt_grid.pack_quad(m, grid))(ndt_map)
    jax.block_until_ready(table)

    scan_poses = synth.rectangle_trajectory(batch, half=17.0, step=1.1)
    r2 = synth.simulate_scans(world, scan_poses, angles, 40.0, 0.01,
                              jax.random.PRNGKey(1))
    spts, smsk = synth.polar_to_xy(r2, angles, 0.1, 40.0)
    init = scan_poses + jnp.asarray([0.2, -0.15, 0.04], spts.dtype)
    mask_f = smsk.astype(spts.dtype)
    px, py = spts[..., 0], spts[..., 1]

    wh, hh = 2 * grid.nx + 1, 2 * grid.ny + 1
    rng = np.random.default_rng(0)
    idx2d = jnp.asarray(rng.integers(0, wh * hh, (batch, n_beams),
                                     dtype=np.int32))
    REPS = 20

    def timeit(tag, f, args_of_k):
        arg_sets = [args_of_k(k) for k in range(REPS)]
        for a in arg_sets:
            jax.block_until_ready(a)
        out = f(*arg_sets[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for k in range(REPS):
            out = f(*arg_sets[k])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS
        log(f"{tag}: {dt*1e6:.0f} us")
        return dt

    n_rows = wh * hh

    g2d = jax.jit(lambda t, i: jnp.sum(t[i], axis=-1))
    timeit("gather 2D idx [B,N]      ", g2d,
           lambda k: (table, (idx2d + k) % n_rows))

    gfl = jax.jit(lambda t, i: jnp.sum(
        t[i.reshape(-1)].reshape(i.shape + (32,)), axis=-1))
    timeit("gather flat-reshape      ", gfl,
           lambda k: (table, (idx2d + k) % n_rows))

    def poses_k(k):
        return init + jnp.asarray([1e-4 * k, -1e-4 * k, 0.0], init.dtype)

    # full sgh, current 2D path
    def sgh(t, poses, flat):
        c = jnp.cos(poses[:, 2])[:, None]
        s = jnp.sin(poses[:, 2])[:, None]
        x = c * px - s * py + poses[:, 0, None]
        y = s * px + c * py + poses[:, 1, None]
        dpx = -s * px - c * py
        dpy = c * px - s * py
        inv = jnp.asarray(2.0 / grid.cell, x.dtype)
        hx = jnp.floor((x - grid.x0) * inv)
        hy = jnp.floor((y - grid.y0) * inv)
        inb = (hx >= 0) & (hx < wh) & (hy >= 0) & (hy < hh)
        fid = hy * wh + hx
        idx = jnp.clip(fid.astype(jnp.int32), 0, wh * hh - 1)
        if flat:
            rows = t[idx.reshape(-1)].reshape(idx.shape + (32,))
        else:
            rows = t[idx]
        w = mask_f * inb.astype(x.dtype)
        return ndt_match.point_terms_quad(poses, x, y, dpx, dpy, rows, w,
                                          mcfg, grid.overlap)

    s2d = jax.jit(lambda t, p: sgh(t, p, False))
    sfl = jax.jit(lambda t, p: sgh(t, p, True))
    timeit("sgh 2D gather            ", s2d, lambda k: (table, poses_k(k)))
    timeit("sgh flat gather          ", sfl, lambda k: (table, poses_k(k)))

    # full matcher with flat gather patched in via monkeypatching lookup_quad
    orig = ndt_grid.lookup_quad

    def lookup_quad_flat(tbl, x, y, g):
        dt = x.dtype
        whh, hhh = ndt_grid._quad_lattice(g)
        inv = jnp.asarray((2.0 if g.overlap == 4 else 1.0) / g.cell, dt)
        hx = jnp.floor((x - g.x0) * inv)
        hy = jnp.floor((y - g.y0) * inv)
        inb = (hx >= 0) & (hx < whh) & (hy >= 0) & (hy < hhh)
        fid = hy * whh + hx
        idx = jnp.clip(fid.astype(jnp.int32), 0, whh * hhh - 1)
        rows = tbl[idx.reshape(-1)].reshape(idx.shape + (tbl.shape[-1],))
        return rows, inb

    full2d = jax.jit(lambda p, m, nm, i: ndt_match.match_batch(
        p, m, nm, i, grid, mcfg))
    t_2d = timeit("match_batch 2D (current) ", full2d,
                  lambda k: (spts, smsk, ndt_map, poses_k(k)))

    ndt_grid.lookup_quad = lookup_quad_flat
    try:
        fullfl = jax.jit(lambda p, m, nm, i: ndt_match.match_batch(
            p, m, nm, i, grid, mcfg))
        t_fl = timeit("match_batch flat gather  ", fullfl,
                      lambda k: (spts, smsk, ndt_map, poses_k(k)))
        o2 = full2d(spts, smsk, ndt_map, init)
        of = fullfl(spts, smsk, ndt_map, init)
        log(f"pose agreement max|diff|: "
            f"{float(jnp.max(jnp.abs(o2.pose - of.pose))):.2e}")
        log(f"scans/s: 2D {batch/t_2d:.0f} -> flat {batch/t_fl:.0f}")
    finally:
        ndt_grid.lookup_quad = orig


if __name__ == "__main__":
    main()
