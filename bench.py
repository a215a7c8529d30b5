"""Headline benchmark: NDT registration throughput (scans/s/chip).

Prints ONE JSON line to stdout:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload (BASELINE configs 1/3 shape): B concurrent scan-to-map NDT
registrations (720 beams each) against a 64x64 m map at 0.5 m cells with the
classic 4 overlap grids — the loop-closure-verification / serving shape where
the >=5x-per-chip target lives (BASELINE.md).

``vs_baseline``: the reference C++ binary cannot be built (empty reference
checkout, SURVEY.md §0) and publishes no numbers, so the single-thread
baseline of record is ``ndt_numpy.match_vectorized`` — same algorithm,
workload and convergence controls, inner loop vectorized through BLAS-backed
numpy on one core (the performance class of an Eigen C++ implementation).
vs_baseline = TPU scans/s / single-thread scans/s.

Extra diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: repeat driver runs skip the ~30s compiles.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/ndtpu_jax_cache")
    except Exception:
        pass

    from ndtpu.config import GridConfig, MatchConfig, NDTMapConfig
    from ndtpu.data import synth
    from ndtpu.ndt import grid as ndt_grid
    from ndtpu.ndt import match as ndt_match
    from ndtpu.reference_impl import ndt_numpy

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    grid = GridConfig(x0=-32.0, y0=-32.0, cell=0.5, nx=128, ny=128, overlap=4)
    mcfg = MatchConfig()
    ncfg = NDTMapConfig()
    n_beams, batch = 720, 256

    # --- map + scan batch from the synthetic world (fixed seed).
    world = synth.box_world(half=28.0)
    angles = synth.beam_angles(n_beams)
    key = jax.random.PRNGKey(0)
    map_poses = synth.rectangle_trajectory(64, half=18.0, step=1.5)
    ranges = synth.simulate_scans(world, map_poses, angles, 40.0, 0.01, key)
    mpts, mmsk = synth.polar_to_xy(ranges, angles, 0.1, 40.0)
    world_pts = synth.se2.transform(map_poses, mpts)
    stats = ndt_grid.build_stats(world_pts.reshape(-1, 2),
                                 mmsk.reshape(-1), grid)
    ndt_map = ndt_grid.finalize(stats, ncfg)

    log("map built")
    scan_poses = synth.rectangle_trajectory(batch, half=17.0, step=1.1)
    r2 = synth.simulate_scans(world, scan_poses, angles, 40.0, 0.01,
                              jax.random.PRNGKey(1))
    spts, smsk = synth.polar_to_xy(r2, angles, 0.1, 40.0)
    init = scan_poses + jnp.asarray([0.2, -0.15, 0.04], spts.dtype)

    # The map is a runtime ARGUMENT, not a closure: closing over multi-MB
    # device arrays embeds them as HLO constants, which this backend
    # compiles pathologically slowly (~300s vs <5s, measured).
    fn = jax.jit(lambda p, m, nm, i: ndt_match.match_batch(
        p, m, nm, i, grid, mcfg))

    t0 = time.perf_counter()
    out = fn(spts, smsk, ndt_map, init)
    jax.block_until_ready(out.pose)
    t_compile = time.perf_counter() - t0
    conv = int(jnp.sum(out.converged))
    log(f"compile+first: {t_compile:.1f}s; converged {conv}/{batch}, "
        f"mean iters {float(jnp.mean(out.n_iter)):.1f}")

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(spts, smsk, ndt_map, init)
    jax.block_until_ready(out.pose)
    dt = (time.perf_counter() - t0) / reps
    scans_per_s = batch / dt
    log(f"warm: {dt*1e3:.1f} ms / {batch} scans -> {scans_per_s:.0f} scans/s")

    # --- single-thread baseline on the identical workload (3 scans).
    m_np = ndt_numpy.NumpyNDTMap(grid.x0, grid.y0, grid.cell, grid.nx,
                                 grid.ny, grid.overlap, ncfg.min_pts,
                                 ncfg.eig_ratio, ncfg.eig_abs_min)
    m_np.n = np.asarray(stats.n, float)
    m_np.s = np.asarray(stats.s, float)
    m_np.ss = np.asarray(stats.ss, float)
    m_np.finalize()
    k = 8
    t0 = time.perf_counter()
    for b in range(k):
        ndt_numpy.match_vectorized(
            np.asarray(spts[b], float), np.asarray(smsk[b]), m_np,
            np.asarray(init[b], float))
    base_per_scan = (time.perf_counter() - t0) / k
    base_scans_per_s = 1.0 / base_per_scan
    log(f"single-thread baseline: {base_scans_per_s:.1f} scans/s")

    print(json.dumps({
        "metric": "ndt_registration_throughput",
        "value": round(scans_per_s, 1),
        "unit": "scans/s/chip",
        "vs_baseline": round(scans_per_s / base_scans_per_s, 1),
    }))


if __name__ == "__main__":
    main()
