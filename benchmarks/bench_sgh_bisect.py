"""Bisect the matcher's per-iteration (sgh) cost on hardware.

The raw row gather is ~28 us at B=256 x N=720 (bench_gather_width), yet the
LM loop costs ~600 us/iteration. This times each composition stage with
varied inputs and pipelined dispatch:

  g1  gather from PRECOMPUTED [B, N] indices + sum
  g2  lookup_quad (index math from x/y planes) + sum
  g3  g2 + point_terms_quad (full objective, no transform)
  g4  full sgh (pose -> transform -> lookup -> terms)
  g5  g4 + damped 3x3 solve + pose update (one full LM body, no accept logic)
"""

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

    # pose variants
    def poses_k(k):
        return init + jnp.asarray([1e-4 * k, -1e-4 * k, 0.0], init.dtype)

    # world planes at init (for precomputed index / fixed-plane stages)
    def planes(poses):
        c = jnp.cos(poses[:, 2])[:, None]
        s = jnp.sin(poses[:, 2])[:, None]
        x = c * px - s * py + poses[:, 0, None]
        y = s * px + c * py + poses[:, 1, None]
        dpx = -s * px - c * py
        dpy = c * px - s * py
        return x, y, dpx, dpy

    x0, y0, dpx0, dpy0 = jax.jit(planes)(init)
    wh = 2 * grid.nx + 1
    hh = 2 * grid.ny + 1
    inv = 2.0 / grid.cell
    idx0 = jnp.clip((jnp.floor((x0 - grid.x0) * inv) * wh
                     + jnp.floor((y0 - grid.y0) * inv)).astype(jnp.int32),
                    0, wh * hh - 1)

    # g1: precomputed idx gather + sum
    g1 = jax.jit(lambda t, i: jnp.sum(t[i], axis=-1))
    timeit("g1 gather(pre-idx)+sum  ", g1,
           lambda k: (table, (idx0 + k) % (wh * hh)))

    # g2: lookup_quad from x/y planes + sum
    g2 = jax.jit(lambda t, x, y: jnp.sum(
        ndt_grid.lookup_quad(t, x, y, grid)[0], axis=-1))
    timeit("g2 lookup_quad+sum      ", g2,
           lambda k: (table, x0 + 1e-4 * k, y0 - 1e-4 * k))

    # g3: lookup + point terms (fixed planes)
    def f3(t, poses, x, y, dpx, dpy):
        rows, inb = ndt_grid.lookup_quad(t, x, y, grid)
        w = mask_f * inb.astype(x.dtype)
        return ndt_match.point_terms_quad(poses, x, y, dpx, dpy, rows, w,
                                          mcfg, grid.overlap)
    g3 = jax.jit(f3)
    timeit("g3 lookup+terms         ", g3,
           lambda k: (table, poses_k(k), x0 + 1e-4 * k, y0, dpx0, dpy0))

    # g4: full sgh from poses
    def f4(t, poses):
        x, y, dpx, dpy = planes(poses)
        rows, inb = ndt_grid.lookup_quad(t, x, y, grid)
        w = mask_f * inb.astype(x.dtype)
        return ndt_match.point_terms_quad(poses, x, y, dpx, dpy, rows, w,
                                          mcfg, grid.overlap)
    g4 = jax.jit(f4)
    timeit("g4 full sgh             ", g4, lambda k: (table, poses_k(k)))

    # g5: one full LM body
    def f5(t, poses, lam):
        f, g, h, wsum, w0sum = f4(t, poses)
        delta = jax.vmap(ndt_match._solve_damped,
                         in_axes=(0, 0, 0, None))(h, g, lam, poses.dtype)
        return poses + delta
    g5 = jax.jit(f5)
    lam = jnp.full((batch,), 1.0, init.dtype)
    timeit("g5 LM body (sgh+solve)  ", g5, lambda k: (table, poses_k(k), lam))


if __name__ == "__main__":
    main()
