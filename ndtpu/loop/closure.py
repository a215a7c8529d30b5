"""Loop-closure detection: proximity candidates + batched NDT verification.

Capability parity (SURVEY.md §3.1 "Loop-closure detector", §4.5): candidates
are keyframes near the current pose with a large index gap; each candidate is
verified by NDT alignment of the current scan against a local map built
around the candidate, and accepted on a score gate. Accepted candidates
become between factors whose information is the registration Hessian
(reference behavior: ``noise(H)``).

TPU-first design — this is the headline batching win (SURVEY.md §3.3 "DP"):
the reference verifies candidates sequentially; here all ``C`` candidates are
stacked on a batch axis and verified in ONE compiled program — C local map
builds (vmapped segment_sum) + C registrations (vmapped LM while_loop).
Candidate *selection* is also in-graph (top-k by distance over the masked
keyframe array), so the whole detector can run inside a jitted update step
or be pjit-sharded over the candidate axis for multi-chip (SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndtpu.config import GridConfig, LoopConfig, MatchConfig, NDTMapConfig
from ndtpu.lie import se2
from ndtpu.ndt import grid as ndt_grid
from ndtpu.ndt import match as ndt_match
from ndtpu.slam.keyframes import KeyframeStore

__all__ = ["LoopCandidates", "LoopResult", "local_grid_config",
           "find_candidates", "verify_candidates", "detect_loops"]


class LoopCandidates(NamedTuple):
    idx: jax.Array    # [C] int32 candidate keyframe indices
    mask: jax.Array   # [C] bool — candidate slot is real
    dist: jax.Array   # [C] distance from the query pose (for diagnostics)


class LoopResult(NamedTuple):
    """Batched loop factors from keyframe j (candidate) to the query frame.

    ``z`` is the measured pose of the query scan in keyframe ``j``'s frame —
    exactly the between-factor measurement for the edge ``(j, query)``.
    """

    j: jax.Array          # [C] int32
    z: jax.Array          # [C, 3]
    sqrt_info: jax.Array  # [C, 3, 3]
    score: jax.Array      # [C] mean per-point NDT score
    accept: jax.Array     # [C] bool — passed the score/convergence gate


def local_grid_config(cfg: LoopConfig) -> GridConfig:
    """Static grid geometry of the per-candidate local NDT map (centered on
    the candidate keyframe's sensor origin)."""
    half = cfg.local_half_extent
    n = int(round(2.0 * half / cfg.local_cell))
    return GridConfig(x0=-half, y0=-half, cell=cfg.local_cell, nx=n, ny=n,
                      overlap=cfg.local_overlap)


def find_candidates(kf: KeyframeStore, query_pose, query_index,
                    cfg: LoopConfig) -> LoopCandidates:
    """Top-C nearest live keyframes within ``radius`` and index gap ``G``.

    ``query_index`` is the keyframe index the query scan will get (so the gap
    test matches the reference's "± traversal gap" rule, SURVEY.md §4.5).
    All-tensor: one masked distance vector + ``lax.top_k`` — no host loop.
    """
    d = jnp.linalg.norm(kf.poses[:, :2] - query_pose[:2], axis=-1)   # [K]
    idx_all = jnp.arange(kf.capacity, dtype=jnp.int32)
    ok = (kf.live
          & (d <= cfg.radius)
          & (query_index - idx_all >= cfg.min_index_gap))
    big = jnp.asarray(jnp.inf, d.dtype)
    d_masked = jnp.where(ok, d, big)
    neg_d, idx = jax.lax.top_k(-d_masked, cfg.max_candidates)
    return LoopCandidates(idx=idx.astype(jnp.int32),
                          mask=jnp.isfinite(-neg_d),
                          dist=-neg_d)


def _local_points(kf: KeyframeStore, j, window: int):
    """Points of keyframes ``j-window .. j+window`` expressed in ``j``'s frame.

    Returns ``(pts [(2w+1)*N, 2], msk [(2w+1)*N])``. Neighbor scans densify
    the local map the same way the reference's ``localMap(j)`` aggregates
    around the candidate (SURVEY.md §4.5); indices are clipped and masked so
    shapes stay static.
    """
    offs = jnp.arange(-window, window + 1, dtype=jnp.int32)          # [W]
    nb = jnp.clip(j + offs, 0, kf.capacity - 1)                      # [W]
    in_range = (j + offs >= 0) & (j + offs < kf.capacity)
    pts = kf.points[nb]                                              # [W, N, 2]
    msk = kf.masks[nb] & kf.live[nb][:, None] & in_range[:, None]    # [W, N]
    # neighbor sensor frame -> world -> candidate j's frame
    world = se2.transform(kf.poses[nb], pts)                         # [W, N, 2]
    local = se2.transform_inv(kf.poses[j], world.reshape(-1, 2))
    return local, msk.reshape(-1)


def verify_candidates(kf: KeyframeStore, query_points, query_mask, query_pose,
                      cands: LoopCandidates, loop_cfg: LoopConfig,
                      ndt_cfg: NDTMapConfig, match_cfg: MatchConfig,
                      window: int = 1) -> LoopResult:
    """Batched NDT verification of all candidates in one program.

    For each candidate ``j``: build the local NDT map around ``j``, register
    the query scan starting from the odometry-predicted relative pose
    ``pose_j^{-1} * query_pose``, and gate on score + convergence.
    """
    lgrid = local_grid_config(loop_cfg)
    dt = query_points.dtype

    def one(j):
        pts, msk = _local_points(kf, j, window)
        stats = ndt_grid.build_stats(pts, msk, lgrid)
        return ndt_grid.finalize(stats, ndt_cfg)

    maps = jax.vmap(one)(cands.idx)            # NDTMap with leading [C] axis

    init = se2.between(kf.poses[cands.idx], query_pose[None, :])     # [C, 3]
    res = jax.vmap(
        ndt_match.match, in_axes=(None, None, 0, 0, None, None)
    )(query_points, query_mask, maps, init, lgrid, match_cfg)

    accept = (cands.mask
              & res.converged
              & (res.score >= loop_cfg.score_gate))
    # Sparsity budget: keep only the top-K accepted candidates by score
    # (LoopConfig.max_accept_per_query rationale — unbudgeted acceptance
    # spams hundreds of redundant factors on revisits).
    k = loop_cfg.max_accept_per_query
    if k and k < loop_cfg.max_candidates:
        ranked = jnp.where(accept, res.score, -jnp.inf)
        kth = jax.lax.top_k(ranked, k)[0][-1]
        accept = accept & (ranked >= kth)
    # Information = registration Hessian, clamped SPD (reference: noise(H)).
    h = 0.5 * (res.hessian + jnp.swapaxes(res.hessian, -1, -2))
    eye = jnp.eye(3, dtype=dt)
    h = h + 1e-3 * eye
    # Zero out rejected rows so downstream masked appends stay clean.
    h = jnp.where(accept[:, None, None], h, eye)
    from ndtpu.graph.factors import info_to_sqrt_info
    sqrt_info = info_to_sqrt_info(h)
    return LoopResult(j=cands.idx, z=res.pose, sqrt_info=sqrt_info,
                      score=res.score, accept=accept)


def detect_loops(kf: KeyframeStore, query_points, query_mask, query_pose,
                 query_index, loop_cfg: LoopConfig, ndt_cfg: NDTMapConfig,
                 match_cfg: MatchConfig, window: int = 1) -> LoopResult:
    """Candidate generation + batched verification in one call (§4.5)."""
    cands = find_candidates(kf, query_pose, query_index, loop_cfg)
    return verify_candidates(kf, query_points, query_mask, query_pose, cands,
                             loop_cfg, ndt_cfg, match_cfg, window)
