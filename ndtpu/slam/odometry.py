"""NDT odometry: the scan-to-map front-end loop, fully jitted.

Capability parity (SURVEY.md §4.1 "Main SLAM loop", frontend half): for each
scan — predict from odometry, register against the current NDT map, spawn a
keyframe on distance/angle thresholds, fold keyframe scans into the map.

TPU-first design: the whole sequence is ONE ``lax.scan`` over time steps with
the dense map statistics as the carry — the map update is a masked
``segment_sum`` (a rejected keyframe contributes weight 0), so there is no
data-dependent control flow and the entire T-scan run compiles to a single
XLA program. The reference runs this loop scan-by-scan on the host
(SURVEY.md §4.1); here host↔device traffic is one transfer in, one out.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndtpu.config import GridConfig, KeyframeConfig, MatchConfig, NDTMapConfig
from ndtpu.lie import se2
from ndtpu.ndt import grid as ndt_grid
from ndtpu.ndt import match as ndt_match

__all__ = ["OdometryResult", "run_odometry"]


class OdometryResult(NamedTuple):
    poses: jax.Array       # [T, 3] estimated trajectory
    scores: jax.Array      # [T] per-scan NDT match quality
    n_iters: jax.Array     # [T] LM iterations per scan
    converged: jax.Array   # [T] bool
    is_keyframe: jax.Array  # [T] bool
    stats: ndt_grid.NDTStats  # final map statistics (for rendering / reuse)


def run_odometry(points, mask, odom, grid: GridConfig, ndt_cfg: NDTMapConfig,
                 match_cfg: MatchConfig, kf_cfg: KeyframeConfig,
                 init_pose=None) -> OdometryResult:
    """Run scan-to-map NDT odometry over a sequence.

    points ``[T, N, 2]`` sensor-frame scans, mask ``[T, N]``, odom ``[T, 3]``
    relative odometry deltas (``odom[0]`` ignored). Scan 0 is taken as the
    first keyframe at ``init_pose`` (default identity).
    """
    dt = points.dtype
    t0 = jnp.zeros((3,), dt) if init_pose is None else init_pose.astype(dt)

    stats0 = ndt_grid.add_points(
        ndt_grid.empty_stats(grid, dt), se2.transform(t0, points[0]),
        mask[0], grid)

    def step(carry, inp):
        stats, pose_prev, last_kf = carry
        pts, msk, delta = inp
        init = se2.compose(pose_prev, delta)
        ndt_map = ndt_grid.finalize(stats, ndt_cfg)
        res = ndt_match.match(pts, msk, ndt_map, init, grid, match_cfg)
        pose = res.pose
        diff = se2.between(last_kf, pose)
        is_kf = (jnp.sqrt(diff[0] ** 2 + diff[1] ** 2) > kf_cfg.dist_thresh) | (
            jnp.abs(diff[2]) > kf_cfg.angle_thresh)
        wpts = se2.transform(pose, pts)
        stats = ndt_grid.add_points(stats, wpts, msk & is_kf, grid)
        last_kf = jnp.where(is_kf, pose, last_kf)
        out = (pose, res.score, res.n_iter, res.converged, is_kf)
        return (stats, pose, last_kf), out

    carry0 = (stats0, t0, t0)
    (stats, _, _), (poses, scores, iters, conv, is_kf) = jax.lax.scan(
        step, carry0, (points[1:], mask[1:], odom[1:]))

    one_true = jnp.ones((1,), bool)
    return OdometryResult(
        poses=jnp.concatenate([t0[None], poses], axis=0),
        scores=jnp.concatenate([jnp.ones((1,), dt), scores]),
        n_iters=jnp.concatenate([jnp.zeros((1,), jnp.int32), iters]),
        converged=jnp.concatenate([one_true, conv]),
        is_keyframe=jnp.concatenate([one_true, is_kf]),
        stats=stats,
    )
