"""Probe relay/runtime timing semantics: identical vs varied repeat calls.

If repeated calls with IDENTICAL buffers are cheaper than calls whose inputs
change every repetition, the measurement path is caching/deduping executions
and every throughput number must be taken with varied inputs.
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

    scan_poses = synth.rectangle_trajectory(batch, half=17.0, step=1.1)
    r2 = synth.simulate_scans(world, scan_poses, angles, 40.0, 0.01,
                              jax.random.PRNGKey(1))
    spts, smsk = synth.polar_to_xy(r2, angles, 0.1, 40.0)
    init = scan_poses + jnp.asarray([0.2, -0.15, 0.04], spts.dtype)

    fn = jax.jit(lambda p, m, nm, i: ndt_match.match_batch(
        p, m, nm, i, grid, mcfg))

    # Pre-build 10 distinct init arrays (tiny jitter -> same convergence).
    inits = [init + jnp.asarray([1e-4 * k, -1e-4 * k, 0.0], init.dtype)
             for k in range(10)]
    for v in inits:
        v.block_until_ready()

    out = fn(spts, smsk, ndt_map, inits[0])
    jax.block_until_ready(out.pose)
    log(f"first call done; max iters {int(jnp.max(out.n_iter))}, "
        f"conv {int(jnp.sum(out.converged))}/{batch}")

    # A: identical args every rep
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(spts, smsk, ndt_map, inits[0])
    jax.block_until_ready(out.pose)
    ta = (time.perf_counter() - t0) / 10
    log(f"identical-args: {ta*1e3:.2f} ms/call -> {batch/ta:.0f} scans/s")

    # B: varied init each rep
    t0 = time.perf_counter()
    for k in range(10):
        out = fn(spts, smsk, ndt_map, inits[k])
    jax.block_until_ready(out.pose)
    tb = (time.perf_counter() - t0) / 10
    log(f"varied-args:    {tb*1e3:.2f} ms/call -> {batch/tb:.0f} scans/s")

    # C: varied, blocking every call (no pipelining)
    t0 = time.perf_counter()
    for k in range(10):
        out = fn(spts, smsk, ndt_map, inits[k])
        jax.block_until_ready(out.pose)
    tc = (time.perf_counter() - t0) / 10
    log(f"varied+block:   {tc*1e3:.2f} ms/call -> {batch/tc:.0f} scans/s")

    # D: dispatch-latency floor: trivial jitted add, varied scalar
    tiny = jax.jit(lambda x: x + 1.0)
    xs = [jnp.asarray(float(k)) for k in range(10)]
    tiny(xs[0]).block_until_ready()
    t0 = time.perf_counter()
    for k in range(10):
        y = tiny(xs[k])
        y.block_until_ready()
    td = (time.perf_counter() - t0) / 10
    log(f"tiny-op round trip: {td*1e3:.2f} ms")


if __name__ == "__main__":
    main()
