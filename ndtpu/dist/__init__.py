from ndtpu.dist.mesh import (batch_mesh, grid_mesh, multihost_mesh,
                             space_mesh)
from ndtpu.dist.registration import match_batch_sharded
from ndtpu.dist.gridmap import (SlabMap, SlabStats, build_slab_stats,
                                build_slab_stats_psharded, finalize_slab,
                                match_slab)
from ndtpu.dist.schur import (SchurPlan, ShardData, optimize_schur,
                              plan_partition, schur_delta, shard_factor_data,
                              shard_factor_data_local, shard_data_global)
from ndtpu.dist.slam_dp import (run_sessions, run_sessions_sharded,
                                run_sessions_stacked, serving_config,
                                vmap_cond_hazards)

__all__ = [
    "batch_mesh", "grid_mesh", "multihost_mesh", "space_mesh",
    "match_batch_sharded",
    "SlabMap", "SlabStats", "build_slab_stats", "build_slab_stats_psharded",
    "finalize_slab", "match_slab",
    "SchurPlan", "ShardData", "optimize_schur", "plan_partition",
    "schur_delta", "shard_factor_data", "shard_factor_data_local",
    "shard_data_global",
    "run_sessions", "run_sessions_sharded", "run_sessions_stacked",
    "serving_config", "vmap_cond_hazards",
]
