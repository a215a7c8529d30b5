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

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ndtpu.config import PipelineConfig
from ndtpu.slam import pipeline

__all__ = ["run_sessions", "run_sessions_sharded"]


def run_sessions(points, mask, odom, cfg: PipelineConfig):
    """S sessions on the local device: ``vmap`` of the windowed pipeline.

    points ``[S, T, N, 2]``, mask ``[S, T, N]``, odom ``[S, T, 3]``.
    Returns the vmapped ``(SlamState, SlamStepOut)`` with leading ``S``.
    On one chip this is the multi-robot serving shape (aggregate scans/s
    across sessions); under ``run_sessions_sharded`` it is the per-device
    workload.
    """
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
