"""Supernodal partitioned Cholesky: direct sparse elimination as batched
dense blocks (BASELINE config 4; SURVEY.md §3.2 "Inference / elimination").

GTSAM eliminates with a sequential multifrontal QR/Cholesky over a clique
tree. The TPU-native re-engineering turns the same math into three MXU-shaped
stages with NO sequential factor-level loop:

1. **Partition** (host, once per topology): RCM-permute the poses (native
   C++ ordering, ndtpu.native) so the Hessian is banded, then split into P
   contiguous supernodes; poses touched by cross-supernode factors form the
   separator (exactly the nested-dissection interface).
2. **Batched interior elimination** (device): all P supernode systems
   ``H_II^(s)`` are factorized in ONE batched Cholesky ``[P, ni3, ni3]`` and
   their Schur contributions are formed with batched triangular solves +
   einsums — the "supernodal frontal matrices as blocked XLA ops" design.
3. **Separator solve + batched back-substitution**: the reduced dense
   system (sum of Schur contributions) is factorized once; interiors
   back-substitute in parallel.

The identical partition logic drives the multi-host distributed solve
(ndtpu.dist.schur) — this module is its single-chip batched counterpart and
the throughput path for 10k+-pose graphs where a [3V, 3V] dense factor does
not fit (30k x 30k f32 = 3.6 GB) and PCG iteration counts climb.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ndtpu.config import SolverConfig
from ndtpu.dist.schur import SchurPlan, plan_partition
from ndtpu.graph import factors as fct
from ndtpu.graph import solve as slv

__all__ = ["SupernodalPlan", "plan_supernodal", "supernodal_delta",
           "optimize_supernodal"]


class SupernodalPlan(NamedTuple):
    schur: SchurPlan
    perm: np.ndarray       # [V] RCM permutation (position -> original pose)
    n_shards: int


def plan_supernodal(graph: fct.PoseGraph, n_shards: int,
                    use_rcm: bool = True) -> SupernodalPlan:
    """Host-side symbolic analysis: ordering + supernode partition."""
    bet_i = np.asarray(graph.bet_i)
    bet_j = np.asarray(graph.bet_j)
    bet_mask = np.asarray(graph.bet_mask)
    v = graph.poses.shape[0]

    if use_rcm:
        from ndtpu.native import rcm_order
        live = bet_mask
        perm = rcm_order(bet_i[live], bet_j[live], v)   # position -> vertex
    else:
        perm = np.arange(v, dtype=np.int32)
    inv = np.empty(v, np.int64)
    inv[perm] = np.arange(v)

    plan = plan_partition(
        inv[bet_i].astype(np.int32), inv[bet_j].astype(np.int32), bet_mask,
        inv[np.asarray(graph.prior_idx)].astype(np.int32),
        np.asarray(graph.prior_mask), v, n_shards)
    # Re-express the plan's variable maps in ORIGINAL pose indices so the
    # device step scatters straight into the unpermuted delta.
    plan = plan._replace(
        int_global=perm[plan.int_global].astype(np.int32),
        sep_global=perm[plan.sep_global].astype(np.int32),
    )
    return SupernodalPlan(schur=plan, perm=np.asarray(perm), n_shards=n_shards)


def _assemble_batched(plan: SchurPlan, ai, aj, r, ap, rp, dt):
    """All P supernode systems in one vmapped scatter-add.

    Returns ``(h [P, m3, m3], b [P, m3])`` with the local variable space
    ``[ni interior | ns separator]`` per supernode.
    """
    ni, ns = plan.ni, plan.ns
    m = ni + ns

    def one(fac_idx, fac_mask, i_role, i_loc, j_role, j_loc,
            pri_idx, pri_mask, p_role, p_loc):
        fa_i = ai[fac_idx] * fac_mask[:, None, None].astype(dt)
        fa_j = aj[fac_idx] * fac_mask[:, None, None].astype(dt)
        fr = r[fac_idx] * fac_mask[:, None].astype(dt)
        col_i = jnp.where(i_role == 1, ni + i_loc, i_loc)
        col_j = jnp.where(j_role == 1, ni + j_loc, j_loc)
        pa = ap[pri_idx] * pri_mask[:, None, None].astype(dt)
        pr = rp[pri_idx] * pri_mask[:, None].astype(dt)
        col_p = jnp.where(p_role == 1, ni + p_loc, p_loc)

        h = jnp.zeros((m, m, 3, 3), dt)
        b = jnp.zeros((m, 3), dt)
        h = h.at[col_i, col_i].add(jnp.einsum("fab,fac->fbc", fa_i, fa_i))
        h = h.at[col_i, col_j].add(jnp.einsum("fab,fac->fbc", fa_i, fa_j))
        h = h.at[col_j, col_i].add(jnp.einsum("fab,fac->fbc", fa_j, fa_i))
        h = h.at[col_j, col_j].add(jnp.einsum("fab,fac->fbc", fa_j, fa_j))
        h = h.at[col_p, col_p].add(jnp.einsum("fab,fac->fbc", pa, pa))
        b = b.at[col_i].add(jnp.einsum("fab,fa->fb", fa_i, fr))
        b = b.at[col_j].add(jnp.einsum("fab,fa->fb", fa_j, fr))
        b = b.at[col_p].add(jnp.einsum("fab,fa->fb", pa, pr))
        return (jnp.transpose(h, (0, 2, 1, 3)).reshape(3 * m, 3 * m),
                b.reshape(-1))

    return jax.vmap(one)(
        jnp.asarray(plan.fac_idx), jnp.asarray(plan.fac_mask),
        jnp.asarray(plan.i_role), jnp.asarray(plan.i_loc),
        jnp.asarray(plan.j_role), jnp.asarray(plan.j_loc),
        jnp.asarray(plan.pri_idx), jnp.asarray(plan.pri_mask),
        jnp.asarray(plan.p_role), jnp.asarray(plan.p_loc))


def supernodal_delta(graph: fct.PoseGraph, lin, plan: SupernodalPlan, lam):
    """One damped-GN step via batched supernodal elimination.

    All heavy stages are batched dense ops: ``[P, ni3, ni3]`` Cholesky,
    ``[P, ni3, ns3]`` triangular solves, one ``[ns3, ns3]`` reduced solve.
    """
    (ai, aj, r), (ap, rp) = lin
    dt = ai.dtype
    sp = plan.schur
    v = graph.poses.shape[0]
    ni3, ns3 = 3 * sp.ni, 3 * sp.ns

    h, b = _assemble_batched(sp, ai, aj, r, ap, rp, dt)   # [P, m3, m3]
    h_ii = h[:, :ni3, :ni3]
    h_is = h[:, :ni3, ni3:]
    h_ss = h[:, ni3:, ni3:]
    b_i = b[:, :ni3]
    b_s = b[:, ni3:]

    int_mask = jnp.asarray(sp.int_mask)
    live_i = jnp.repeat(int_mask.astype(dt), 3, axis=1)          # [P, ni3]
    diag_i = jnp.abs(jnp.diagonal(h_ii, axis1=-2, axis2=-1))
    damp_i = lam * jnp.maximum(diag_i, 1e-8) + (1.0 - live_i)
    h_ii = h_ii + jax.vmap(jnp.diag)(damp_i)

    l = jnp.linalg.cholesky(h_ii)                                # [P,ni3,ni3]
    w = jax.scipy.linalg.cho_solve((l, True), h_is)              # batched
    y = jax.scipy.linalg.cho_solve((l, True), b_i[..., None])[..., 0]

    s_tot = jnp.sum(h_ss - jnp.einsum("pij,pik->pjk", h_is, w), axis=0)
    rhs_tot = jnp.sum(b_s - jnp.einsum("pij,pi->pj", h_is, y), axis=0)
    diag_ss = jnp.sum(jnp.diagonal(h_ss, axis1=-2, axis2=-1), axis=0)

    sep_mask = jnp.asarray(sp.sep_mask)
    live_s = jnp.repeat(sep_mask.astype(dt), 3)
    damp_s = lam * jnp.maximum(jnp.abs(diag_ss), 1e-8) + (1.0 - live_s)
    s_tot = s_tot + jnp.diag(damp_s)
    ls = jnp.linalg.cholesky(s_tot)
    x_s = jax.scipy.linalg.cho_solve((ls, True), -rhs_tot)

    x_i = -(y + jnp.einsum("pij,j->pi", w, x_s))                 # [P, ni3]

    delta = jnp.zeros((v, 3), dt)
    delta = delta.at[jnp.asarray(sp.int_global)].add(
        x_i.reshape(-1, sp.ni, 3) * int_mask[..., None].astype(dt))
    delta = delta.at[jnp.asarray(sp.sep_global)].add(
        x_s.reshape(sp.ns, 3) * sep_mask[:, None].astype(dt))
    return delta


def optimize_supernodal(graph: fct.PoseGraph, cfg: SolverConfig,
                        n_shards: int = 32, huber_delta: float = 0.0,
                        plan: SupernodalPlan | None = None) -> slv.SolveResult:
    """Nonlinear LM loop around the supernodal step (config 4 entry point)."""
    if plan is None:
        plan = plan_supernodal(graph, n_shards)
    dt = graph.poses.dtype

    step = jax.jit(lambda g, lin, lam: supernodal_delta(g, lin, plan, lam))

    lam = cfg.init_lambda
    chi = float(fct.chi2(graph, huber_delta))
    it, converged = 0, False
    for it in range(1, cfg.max_iter + 1):
        lin = fct.linearize(graph, huber_delta)
        delta = step(graph, lin, jnp.asarray(lam, dt))
        trial = graph._replace(
            poses=slv._apply_delta(graph.poses, delta, graph.pose_mask))
        chi_t = float(fct.chi2(trial, huber_delta))
        if chi_t < chi:
            graph, chi = trial, chi_t
            lam = max(lam / cfg.lambda_down, 1e-12)
            if float(jnp.max(jnp.abs(delta))) < cfg.tol:
                converged = True
                break
        else:
            lam *= cfg.lambda_up
            if lam > 1e8:
                break
    return slv.SolveResult(graph=graph, chi2=jnp.asarray(chi, dt),
                           n_iter=jnp.asarray(it, jnp.int32),
                           converged=jnp.asarray(converged))
