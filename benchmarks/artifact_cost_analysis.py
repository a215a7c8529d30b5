"""Speed-of-light artifact: XLA cost_analysis + measured time for the two
hot kernels (VERDICT r3 item 4), checked in under docs/artifacts/.

Dumps ``lowered.compile().cost_analysis()`` (FLOPs, bytes accessed — the
compiler's own roofline inputs) plus honest measured wall-clock for:

1. one matcher sgh evaluation at the serving shape (B x 720 beams,
   128x128 map quad table) — the per-LM-iteration unit the scans/s
   headline decomposes into, and
2. one supernodal BA step at 10k poses (linearize + partitioned solve).

Derived rows/s / FLOP/s / B/s go into docs/PERF.md §3's table. Run on the
real chip: ``python benchmarks/artifact_cost_analysis.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ndtpu_jax_cache")

    from ndtpu.config import GridConfig, MatchConfig, NDTMapConfig
    from ndtpu.data import g2o, synth
    from ndtpu.graph import factors as fct
    from ndtpu.graph import supernodal as sn
    from ndtpu.ndt import grid as ndt_grid
    from ndtpu.ndt import match as ndt_match
    from ndtpu.ndt.grid import lookup_quad

    dev = jax.devices()[0]
    out = {"device": str(dev), "platform": dev.platform}
    rng = np.random.default_rng()

    # --- 1. one sgh evaluation at the serving shape ------------------------
    grid = GridConfig(x0=-32.0, y0=-32.0, cell=0.5, nx=128, ny=128, overlap=4)
    mcfg, ncfg = MatchConfig(), NDTMapConfig()
    n_beams, batch = 720, 1024
    world = synth.box_world(half=28.0)
    angles = synth.beam_angles(n_beams)
    map_poses = synth.rectangle_trajectory(64, half=18.0, step=1.5)
    ranges = synth.simulate_scans(world, map_poses, angles, 40.0, 0.01,
                                  jax.random.PRNGKey(0))
    mpts, mmsk = synth.polar_to_xy(ranges, angles, 0.1, 40.0)
    wp = synth.se2.transform(map_poses, mpts)
    stats = ndt_grid.build_stats(wp.reshape(-1, 2), mmsk.reshape(-1), grid)
    table = ndt_grid.pack_quad(ndt_grid.finalize(stats, ncfg), grid)
    scan_poses = synth.rectangle_trajectory(batch, half=17.0, step=1.1)
    r2 = synth.simulate_scans(world, scan_poses, angles, 40.0, 0.01,
                              jax.random.PRNGKey(1))
    spts, smsk = synth.polar_to_xy(r2, angles, 0.1, 40.0)
    poses = scan_poses + jnp.asarray([0.2, -0.15, 0.04], spts.dtype)
    mask_f = smsk.astype(spts.dtype)
    px, py = spts[..., 0], spts[..., 1]

    def sgh(poses, px, py, mask_f, table):
        c = jnp.cos(poses[:, 2])[:, None]
        s = jnp.sin(poses[:, 2])[:, None]
        x = c * px - s * py + poses[:, 0, None]
        y = s * px + c * py + poses[:, 1, None]
        dpx = -s * px - c * py
        dpy = c * px - s * py
        rows, inb = lookup_quad(table, x, y, grid)
        w_mask = mask_f * inb.astype(x.dtype)
        return ndt_match.point_terms_quad(poses, x, y, dpx, dpy, rows,
                                          w_mask, mcfg, grid.overlap)

    fn = jax.jit(sgh)
    lowered = fn.lower(poses, px, py, mask_f, table)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = dict(ca[0]) if isinstance(ca, (list, tuple)) else dict(ca)

    # Per-eval time from a CHAIN of K dependent evals in one dispatch: a
    # single dispatched eval is dominated by the ~20 ms tunnel round-trip
    # (measured 27.6 ms standalone vs ~1.7 ms amortized), so the kernel
    # time must be separated from dispatch (docs/PERF.md traps).
    k_chain = 16

    def chained(poses, px, py, mask_f, table):
        def body(i, p):
            f, g, h, *_ = sgh(p, px, py, mask_f, table)
            return p + 1e-6 * g      # data dependency between evals
        return jax.lax.fori_loop(0, k_chain, body, poses)

    cfn = jax.jit(chained)
    np.asarray(cfn(poses, px, py, mask_f, table))
    ts = []
    for k in range(8):
        pk = poses + jnp.asarray(rng.normal(0, 1e-4, (batch, 3)), spts.dtype)
        np.asarray(pk[0])
        t0 = time.perf_counter()
        np.asarray(cfn(pk, px, py, mask_f, table))
        ts.append(time.perf_counter() - t0)
    t_med = float(np.median(ts)) / k_chain
    n_rows = batch * n_beams
    out["sgh_eval"] = {
        "shape": f"B={batch} x N={n_beams}, 128x128 map, quad table",
        "timing_method": f"chain of {k_chain} dependent evals / {k_chain}",
        "measured_ms": round(t_med * 1e3, 3),
        "gathered_rows": n_rows,
        "rows_per_s": round(n_rows / t_med),
        "xla_flops": ca.get("flops"),
        "xla_bytes_accessed": ca.get("bytes accessed"),
        "achieved_gflops": round(ca.get("flops", 0) / t_med / 1e9, 1),
        "achieved_GBps": round(ca.get("bytes accessed", 0) / t_med / 1e9, 1),
        "cost_analysis": {k: v for k, v in sorted(ca.items())
                          if isinstance(v, (int, float))},
    }

    # --- 2. one supernodal BA step at 10k poses ----------------------------
    data = g2o.manhattan_world(10000, seed=0, loop_prob=0.1)
    g = g2o.to_graph(data, dtype=jnp.float32)
    rng_g = np.random.default_rng(0)
    g = g._replace(poses=g.poses + jnp.asarray(
        rng_g.normal(0, 0.05, g.poses.shape), jnp.float32))
    plan = sn.plan_supernodal(g, 64)
    lam = jnp.asarray(1e-3, jnp.float32)
    step = jax.jit(lambda g_, lam: sn.supernodal_delta(
        g_, fct.linearize(g_), plan, lam))
    lowered2 = step.lower(g, lam)
    ca2 = lowered2.compile().cost_analysis()
    ca2 = dict(ca2[0]) if isinstance(ca2, (list, tuple)) else dict(ca2)
    np.asarray(step(g, lam)[0])
    ts2 = []
    for k in range(8):
        gk = g._replace(poses=g.poses + jnp.asarray(
            rng.normal(0, 1e-6, (1, 1)), jnp.float32))
        np.asarray(gk.poses[0])
        t0 = time.perf_counter()
        r = step(gk, lam)
        np.asarray(r[0])
        ts2.append(time.perf_counter() - t0)
    t2 = float(np.median(ts2))
    out["supernodal_step_10k"] = {
        "shape": "10k poses, ~11k factors, supernode=64",
        "measured_ms": round(t2 * 1e3, 2),
        "xla_flops": ca2.get("flops"),
        "xla_bytes_accessed": ca2.get("bytes accessed"),
        "achieved_gflops": round(ca2.get("flops", 0) / t2 / 1e9, 1),
        "achieved_GBps": round(ca2.get("bytes accessed", 0) / t2 / 1e9, 1),
        "cost_analysis": {k: v for k, v in sorted(ca2.items())
                          if isinstance(v, (int, float))},
    }

    # --- 3. device traces (jax.profiler WORKS through the axon tunnel and
    # carries a real /device:TPU:0 lane with per-fusion timings) -----------
    import glob
    import gzip

    art_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts")

    def capture(tag, thunk):
        tdir = os.path.join("/tmp", f"ndtpu_trace_{tag}")
        import shutil
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            thunk()
        src = sorted(glob.glob(os.path.join(
            tdir, "plugins", "profile", "*", "*.trace.json.gz")))[-1]
        dst = os.path.join(art_dir, f"trace_{tag}.trace.json.gz")
        os.makedirs(art_dir, exist_ok=True)
        shutil.copy(src, dst)
        with gzip.open(src) as f:
            ev = json.load(f).get("traceEvents", [])
        pid_names = {e.get("pid"): e.get("args", {}).get("name")
                     for e in ev
                     if e.get("ph") == "M" and e.get("name") == "process_name"}
        tpu = [e for e in ev
               if "TPU" in str(pid_names.get(e.get("pid"), ""))
               and e.get("ph") == "X"]
        from collections import Counter
        dur = Counter()
        for e in tpu:
            dur[e.get("name", "?")] += e.get("dur", 0)
        return {
            "file": os.path.basename(dst),
            "tpu_span_events": len(tpu),
            "tpu_total_us": round(sum(dur.values()), 1),
            "top_ops_us": {k: round(v, 1)
                           for k, v in dur.most_common(10)},
        }

    try:
        out["trace_matcher"] = capture(
            "matcher", lambda: np.asarray(
                fn(poses + 1e-4, px, py, mask_f, table)[0]))
        out["trace_supernodal"] = capture(
            "supernodal", lambda: np.asarray(step(
                g._replace(poses=g.poses + 1e-6), lam)[0]))
    except Exception as e:              # profiler availability may vary
        out["trace_error"] = repr(e)[:300]

    path = os.path.join(art_dir, "cost_analysis.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: (v if not isinstance(v, dict) else
                          {kk: vv for kk, vv in v.items()
                           if kk != "cost_analysis"})
                      for k, v in out.items()}, indent=1))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
