"""Data-parallel multi-session SLAM: one full windowed pipeline per device.

Capability (SURVEY.md §3.3 "DP", BASELINE north star "scans/s measured at 1
chip, 1 host, N>=2 hosts"): S independent SLAM sessions (robots / log
shards) run concurrently — the whole windowed pipeline (registration,
keyframing, loop closure, incremental smoothing, map maintenance) is
``vmap``-ed over a leading session axis and ``shard_map``-ed over the
``"batch"`` mesh axis, so each device owns ``S / n_devices`` sessions
end-to-end with ZERO cross-device communication (sessions are independent;
merging afterwards is ndtpu.slam.merge + the distributed Schur solve,
config 5).

This is the TPU-native scale-out of the SLAM pipeline itself, as opposed
to the per-primitive sharding in ndtpu.dist.registration / gridmap: at
fleet scale the right unit of parallelism is the session, exactly like
batch inference in serving.
"""

from __future__ import annotations

import dataclasses
import warnings

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ndtpu.config import PipelineConfig
from ndtpu.slam import pipeline

__all__ = ["run_sessions", "run_sessions_sharded", "serving_config",
           "vmap_cond_hazards"]


def vmap_cond_hazards(cfg: PipelineConfig) -> list[str]:
    """Config fields whose ``lax.cond`` branches are EXPENSIVE under vmap.

    Under ``vmap`` every ``lax.cond`` lowers to a select that executes BOTH
    branches for the whole batch, so the cost of the rarely-taken branch is
    paid every window for every session (measured ~15x for 8 vmapped
    sessions with the defaults). The offenders, in measured cost order:

    - ``refresh_top_m == 0``: the legacy full-map rebuild (one build_stats
      over ALL keyframe points) runs every window.
    - ``solver.full_solve_every > 0``: the periodic full LM optimization
      (max_iter x PCG) runs every window.
    - ``full_rebuild_every > 0``: the periodic full rebuild runs every
      window (only reachable when refresh_top_m > 0).
    - ``solver.local_poses > 0``: both the k-hop local solve AND the global
      PCG update run every window.
    """
    bad = []
    if cfg.refresh_top_m == 0:
        bad.append("refresh_top_m=0 (full map rebuild every window)")
    elif cfg.full_rebuild_every > 0:
        bad.append("full_rebuild_every>0 (periodic rebuild every window)")
    if cfg.solver.full_solve_every > 0:
        bad.append("solver.full_solve_every>0 (full LM solve every window)")
    if cfg.solver.local_poses > 0:
        bad.append("solver.local_poses>0 (local AND global paths every "
                   "window)")
    return bad


def serving_config(cfg: PipelineConfig,
                   refresh_top_m: int = 24) -> PipelineConfig:
    """A vmap-safe variant of ``cfg`` for stacked multi-session serving.

    Replaces every :func:`vmap_cond_hazards` offender with its
    bounded-cost equivalent:

    - map maintenance: incremental top-M refresh on loop windows
      (``refresh_top_m``, eps=0 — the empirically safe cadence) instead of
      the full rebuild; the decision semantics are unchanged (the refresh
      still only APPLIES on loop windows — under vmap its cost is simply
      paid every window, bounded at M keyframes instead of all of them);
    - smoother: global warm-started PCG only (``local_poses=0``,
      ``full_solve_every=0``) — at serving session lengths (a few hundred
      scans) the periodic full solve never fired anyway, and paying both
      local and global branches per window is strictly worse than global
      alone.
    """
    return dataclasses.replace(
        cfg,
        refresh_top_m=refresh_top_m,
        refresh_eps=0.0,
        full_rebuild_every=0,
        solver=dataclasses.replace(cfg.solver, local_poses=0,
                                   full_solve_every=0),
    )


def run_sessions(points, mask, odom, cfg: PipelineConfig):
    """S sessions on the local device: ``vmap`` of the windowed pipeline.

    points ``[S, T, N, 2]``, mask ``[S, T, N]``, odom ``[S, T, 3]``.
    Returns the vmapped ``(SlamState, SlamStepOut)`` with leading ``S``.
    On one chip this is the multi-robot serving shape (aggregate scans/s
    across sessions); under ``run_sessions_sharded`` it is the per-device
    workload.

    For S > 1 pass a :func:`serving_config`-shaped ``cfg``: vmapped
    ``lax.cond`` executes both branches, so the default config's full-map
    rebuild / full-solve branches run every window (measured ~15x
    slowdown; :func:`vmap_cond_hazards` lists the offenders, and this
    function warns when one is present).
    """
    if points.shape[0] > 1:
        bad = vmap_cond_hazards(cfg)
        if bad:
            warnings.warn(
                "run_sessions with S>1: vmapped lax.cond executes BOTH "
                "branches, and this config has expensive rare branches "
                f"({'; '.join(bad)}) — expect ~15x slowdown. Use "
                "serving_config(cfg) for the bounded-cost equivalents.",
                stacklevel=2)
    return jax.vmap(
        lambda p, m, o: pipeline.run_slam_windowed(p, m, o, cfg)
    )(points, mask, odom)


def run_sessions_sharded(mesh: Mesh, points, mask, odom,
                         cfg: PipelineConfig, axis: str = "batch"):
    """Shard S sessions across the mesh axis; each device runs its shard's
    sessions end-to-end (no collectives — sessions are independent).

    With exactly one session per device (the fleet-scale sweet spot) the
    pipeline runs UNBATCHED on each device: under ``vmap``, every
    ``lax.cond`` in the pipeline lowers to a select that executes BOTH
    branches — including the full-map rebuild — every window (measured
    ~15x slowdown for 8 vmapped sessions on one chip), while the unbatched
    per-device program keeps real branching.
    """
    def local(p, m, o):
        if p.shape[0] == 1:
            st, outs = pipeline.run_slam_windowed(p[0], m[0], o[0], cfg)
            return jax.tree_util.tree_map(lambda a: a[None], (st, outs))
        return run_sessions(p, m, o, cfg)

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False,
    )
    return fn(points, mask, odom)
