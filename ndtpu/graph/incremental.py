"""Incremental pose-graph smoothing: the iSAM2-capability re-engineering.

Capability parity (SURVEY.md §3.2 "iSAM2 incremental smoother", §4.3): after
each new keyframe the backend must refine the trajectory at bounded cost —
GTSAM does this with a Bayes tree (mark affected cliques, selective
relinearization, partial re-elimination). A pointer-based Bayes tree is the
wrong shape for a TPU, so the *capability* is re-engineered (SURVEY.md §8
Phase C, explicitly "not a port"):

- **Warm start replaces partial re-elimination.** The current estimate is
  the linearization point; right after a new keyframe only a small
  neighborhood of the graph is far from its optimum, so the damped-GN
  residual is tiny and block-Jacobi PCG reaches its *relative* tolerance in
  a handful of matvecs. Cost per update is O(nnz * pcg_iters) with
  pcg_iters small and data-adaptive — the bounded-cost property iSAM2 gets
  from clique marking, obtained instead from Krylov convergence.
- **Relinearization is batched, and skipped when useless.** Relinearizing
  *all* factors is one vmap (cheap on TPU); the iSAM2 relinearization
  *threshold* survives as a skip test — if the last accepted step moved no
  pose by more than ``relin_threshold``, the estimate is declared settled
  and the update does zero solves (``lax.cond`` fast path).
- **Periodic full solve replaces periodic batch relinearization**
  (``ISAM2Params.enableRelinearization`` cadence): every
  ``full_solve_every`` updates a full LM optimization with a larger
  iteration budget squeezes out accumulated nonlinearity.

The whole update is one jittable function of static config — usable inside
scan loops and shardable (factor/pose axes) with NamedSharding.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndtpu.config import SolverConfig
from ndtpu.graph import factors as fct
from ndtpu.graph import solve as slv
from ndtpu.lie import se2

__all__ = ["SmootherState", "init_smoother", "incremental_update",
           "fresh_residual_max", "full_solve", "marginal_covariance",
           "marginal_covariance_pcg"]


class SmootherState(NamedTuple):
    graph: fct.PoseGraph
    lam: jax.Array          # [] LM damping carried across updates
    last_max_delta: jax.Array  # [] inf-norm of the last accepted step
    step: jax.Array         # [] int32 update counter


def init_smoother(graph: fct.PoseGraph) -> SmootherState:
    dt = graph.poses.dtype
    return SmootherState(
        graph=graph,
        lam=jnp.asarray(1e-4, dt),
        last_max_delta=jnp.asarray(jnp.inf, dt),
        step=jnp.asarray(0, jnp.int32),
    )


def _one_lm_step(graph, lam, chi, cfg: SolverConfig, huber_delta: float):
    """One accept/reject LM iteration with a PCG inner solve."""
    lin = fct.linearize(graph, huber_delta)
    delta, _ = slv.pcg(graph, lin, lam, cfg)
    new_poses = slv._apply_delta(graph.poses, delta, graph.pose_mask)
    trial = graph._replace(poses=new_poses)
    chi_t = fct.chi2(trial, huber_delta)
    accept = chi_t < chi
    graph_n = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), trial, graph)
    chi_n = jnp.where(accept, chi_t, chi)
    lam_n = jnp.where(accept, jnp.maximum(lam / cfg.lambda_down, 1e-12),
                      lam * cfg.lambda_up)
    max_delta = jnp.where(accept, jnp.max(jnp.abs(delta)),
                          jnp.zeros_like(chi))
    return graph_n, chi_n, lam_n, max_delta


def fresh_residual_max(g: fct.PoseGraph, k: int = 64):
    """Max |whitened residual| over the K NEWEST live between factors.

    The O(K) replacement for the full-graph gradient in the settled-skip
    test (VERDICT r2 item 5: the skip path paid a full O(F) linearize):
    when the estimate was settled, only the factors appended since can
    perturb it, and those sit in the slots just below ``n_between``.
    """
    f_cap = g.bet_mask.shape[0]
    k = min(k, f_cap)
    start = jnp.clip(g.n_between - k, 0, f_cap - k)
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, k, axis=0)
    i, j = sl(g.bet_i), sl(g.bet_j)
    z, sqi = sl(g.bet_z), sl(g.bet_sqrt_info)
    m = sl(g.bet_mask)
    r = jax.vmap(fct.between_error)(g.poses[i], g.poses[j], z)
    wr = jnp.einsum("fab,fb->fa", sqi, r)
    return jnp.max(jnp.where(m[:, None], jnp.abs(wr), 0.0))


def incremental_update(state: SmootherState, cfg: SolverConfig,
                       huber_delta: float = 0.0) -> SmootherState:
    """Bounded-cost refinement after new factors were appended to
    ``state.graph`` (the ``ISAM2::update`` role, SURVEY.md §4.3).

    Runs ``cfg.inc_iters`` warm-started LM-PCG iterations — unless the
    previous update already moved nothing beyond ``cfg.relin_threshold``
    AND no newly-appended factor has meaningful residual; the skip test is
    O(K) over the newest factors (no full-graph linearize), so a settled
    odometry-only run pays near-zero backend cost per update.

    Every ``cfg.full_solve_every``-th update additionally runs a full LM
    optimization (the iSAM2 periodic-batch-relinearization cadence) to
    squeeze out accumulated nonlinearity.
    """
    g = state.graph
    dt = g.poses.dtype

    def do_update(g, lam):
        chi = fct.chi2(g, huber_delta)
        def body(_, carry):
            graph, chi, lam, md = carry
            graph, chi, lam, md_i = _one_lm_step(graph, lam, chi, cfg,
                                                 huber_delta)
            return graph, chi, lam, jnp.maximum(md, md_i)
        graph, chi, lam, md = jax.lax.fori_loop(
            0, cfg.inc_iters, body,
            (g, chi, lam, jnp.asarray(0.0, dt)))
        return graph, lam, md

    def skip(g, lam):
        return g, lam, jnp.asarray(0.0, dt)

    # Settled-estimate fast path: nothing moved last time -> check whether
    # the *newest* factors actually perturb the solution before solving.
    # Two tiers: O(K) fresh-residual test (newly appended factors with
    # ~zero residual — the windowed odometry case — skip without touching
    # the full graph), then the O(F) full-gradient test (a converged noisy
    # graph has noise-level residuals everywhere but zero gradient).
    settled = state.last_max_delta < cfg.relin_threshold
    fresh_small = fresh_residual_max(g) < cfg.relin_threshold

    def slow_check(g, lam):
        # Compare a POSE-STEP surrogate against the threshold, not the raw
        # gradient (dimensionally a force): the block-Jacobi preconditioned
        # gradient is the unconstrained per-pose Newton step and lives in
        # the same units as relin_threshold. A converged noisy graph has
        # grad ~ 0.15 but step ~ 1e-3 (measured) — the raw-gradient test
        # never fired.
        lin = fct.linearize(g, huber_delta)
        grad = slv.gradient(g, lin)
        dblocks = slv.block_diag_hessian(g, lin)
        live = g.pose_mask.astype(dt)
        eye = jnp.eye(3, dtype=dt)
        dblocks = dblocks + (1e-8 + (1.0 - live))[:, None, None] * eye
        step = jnp.einsum("vab,vb->va", slv._inv3(dblocks), grad)
        return jax.lax.cond(jnp.max(jnp.abs(step)) < cfg.relin_threshold,
                            skip, do_update, g, lam)

    graph, lam, md = jax.lax.cond(
        settled & fresh_small, skip,
        lambda g, lam: jax.lax.cond(settled, slow_check, do_update, g, lam),
        g, state.lam)

    step = state.step + 1
    if cfg.full_solve_every > 0:
        def full(g, lam):
            res = slv.optimize(g, cfg, method="pcg",
                               huber_delta=huber_delta)
            return res.graph, jnp.asarray(cfg.init_lambda, dt)
        graph, lam = jax.lax.cond(
            step % cfg.full_solve_every == 0, full,
            lambda g, lam: (g, lam), graph, lam)
    return SmootherState(graph=graph, lam=lam, last_max_delta=md,
                         step=step)


def full_solve(state: SmootherState, cfg: SolverConfig,
               method: str = "pcg", huber_delta: float = 0.0) -> SmootherState:
    """Periodic full batched optimization (the cadence knob
    ``cfg.full_solve_every`` is applied by the caller)."""
    res = slv.optimize(state.graph, cfg, method=method,
                       huber_delta=huber_delta)
    dt = state.graph.poses.dtype
    return SmootherState(graph=res.graph, lam=jnp.asarray(cfg.init_lambda, dt),
                         last_max_delta=jnp.asarray(jnp.inf, dt),
                         step=state.step)


def marginal_covariance_pcg(graph: fct.PoseGraph, idx, cfg: SolverConfig,
                            huber_delta: float = 0.0, lam: float = 1e-8):
    """3x3 marginal covariance of pose ``idx`` on LARGE graphs: three
    matrix-free PCG solves ``H x = e_k`` against the unit vectors of the
    pose's block (GTSAM ``Marginals`` capability, VERDICT r2 item 7) —
    never materializes the ``[3V, 3V]`` Hessian, so cost is
    O(nnz * pcg_iters) and memory O(V)."""
    lin = fct.linearize(graph, huber_delta)
    v = graph.poses.shape[0]
    dt = graph.poses.dtype

    def one(k):
        rhs = jnp.zeros((v, 3), dt).at[idx, k].set(1.0)
        x, _ = slv.pcg_rhs(graph, lin, rhs, jnp.asarray(lam, dt), cfg)
        return x[idx]

    cols = jax.vmap(one)(jnp.arange(3))                 # [3, 3] rows = cols
    return 0.5 * (cols + cols.T)


def marginal_covariance(graph: fct.PoseGraph, idx,
                        huber_delta: float = 0.0):
    """3x3 marginal covariance of pose ``idx`` (GTSAM ``Marginals``
    capability): the corresponding diagonal block of H^{-1} via the dense
    factorization path. Suitable for small/medium graphs; large graphs
    use :func:`marginal_covariance_pcg` (unit-vector PCG solves)."""
    lin = fct.linearize(graph, huber_delta)
    h, _ = slv.normal_equations(graph, lin)
    live = jnp.repeat(graph.pose_mask.astype(h.dtype), 3)
    h = h + jnp.diag(1e-8 + (1.0 - live))
    cov = jnp.linalg.inv(h)
    i0 = 3 * idx
    return jax.lax.dynamic_slice(cov, (i0, i0), (3, 3))
