"""Data-parallel NDT registration: candidates sharded across devices.

Capability (SURVEY.md §3.3 "DP — the workhorse"): B concurrent registrations
(loop-closure verification, multi-robot scan matching, throughput serving)
are sharded over the ``"batch"`` mesh axis; the NDT map is replicated. Zero
collectives in the hot loop — each device runs its slice of the vmapped LM
while_loop; results gather only at the output boundary.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ndtpu.config import GridConfig, MatchConfig
from ndtpu.ndt import match as ndt_match
from ndtpu.ndt.grid import NDTMap

__all__ = ["match_batch_sharded"]


def match_batch_sharded(mesh: Mesh, points, mask, ndt_map: NDTMap,
                        init_poses, grid: GridConfig, cfg: MatchConfig,
                        axis: str = "batch") -> ndt_match.MatchResult:
    """Sharded :func:`ndtpu.ndt.match.match_batch`.

    points ``[B, N, 2]``, mask ``[B, N]``, init_poses ``[B, 3]`` with ``B``
    divisible by the mesh axis size. The arrays are placed with a batch-axis
    NamedSharding and the jitted vmap runs SPMD; XLA partitions it with no
    communication (the map is broadcast once, then cached on-device).
    """
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    points = jax.device_put(points, shard)
    mask = jax.device_put(mask, shard)
    init_poses = jax.device_put(init_poses, shard)
    ndt_map = jax.device_put(ndt_map, repl)

    fn = jax.jit(
        lambda p, m, mp, ip: ndt_match.match_batch(p, m, mp, ip, grid, cfg),
        in_shardings=(shard, shard, repl, shard),
    )
    return fn(points, mask, ndt_map, init_poses)
