"""Incremental smoother: bounded-cost updates match full solves
(SURVEY.md §8 Phase C — the iSAM2-capability re-engineering)."""

import jax.numpy as jnp
import numpy as np

from ndtpu.config import SolverConfig
from ndtpu.graph import factors as fct
from ndtpu.graph import incremental as inc
from ndtpu.graph import solve as slv
from ndtpu.lie import se2

CFG = SolverConfig(inc_iters=3, relin_threshold=1e-4)


def _chain_graph(n=20, noise=0.05, seed=0, dtype=jnp.float64):
    """Noisy odometry chain with a weak loop factor, known ground truth."""
    rng = np.random.default_rng(seed)
    gt = np.zeros((n, 3))
    for k in range(1, n):
        gt[k] = gt[k - 1] + [1.0, 0.0, 2 * np.pi / n]
        gt[k, 2] = (gt[k, 2] + np.pi) % (2 * np.pi) - np.pi
    sq = jnp.asarray(np.diag([10.0, 10.0, 20.0]), dtype)
    g = fct.empty_graph(n, 2, 2 * n, dtype)
    noisy = gt + rng.normal(0, noise, gt.shape)
    noisy[0] = gt[0]
    g = g._replace(poses=jnp.asarray(noisy, dtype),
                   pose_mask=jnp.ones((n,), bool),
                   n_poses=jnp.asarray(n, jnp.int32))
    g = fct.add_prior(g, 0, jnp.asarray(gt[0], dtype), sq)
    for k in range(1, n):
        z = se2.between(jnp.asarray(gt[k - 1], dtype), jnp.asarray(gt[k], dtype))
        g = fct.add_between(g, k - 1, k, z, sq)
    return g, gt


def test_incremental_reduces_chi2():
    g, gt = _chain_graph()
    st = inc.init_smoother(g)
    c0 = float(fct.chi2(g))
    st = inc.incremental_update(st, CFG)
    c1 = float(fct.chi2(st.graph))
    assert c1 < 0.1 * c0, (c0, c1)


def test_settled_fast_path_is_noop():
    g, gt = _chain_graph()
    # Fully converge first.
    res = slv.optimize(g, SolverConfig(max_iter=30), method="dense")
    st = inc.SmootherState(graph=res.graph, lam=jnp.asarray(1e-4, jnp.float64),
                           last_max_delta=jnp.asarray(1e-7, jnp.float64),
                           step=jnp.asarray(5, jnp.int32))
    st2 = inc.incremental_update(st, CFG)
    # Settled + tiny gradient -> poses unchanged bit-for-bit.
    assert bool(jnp.all(st2.graph.poses == st.graph.poses))
    assert float(st2.last_max_delta) == 0.0


def test_incremental_tracks_full_solve():
    """Appending factors one at a time + incremental updates should land near
    the batch solution."""
    g_full, gt = _chain_graph(n=16)
    full = slv.optimize(g_full, SolverConfig(max_iter=40), method="dense")

    # Build the same graph incrementally.
    n = 16
    dtype = jnp.float64
    sq = jnp.asarray(np.diag([10.0, 10.0, 20.0]), dtype)
    g = fct.empty_graph(n, 2, 2 * n, dtype)
    g = fct.add_pose(g, jnp.asarray(gt[0], dtype))
    g = fct.add_prior(g, 0, jnp.asarray(gt[0], dtype), sq)
    st = inc.init_smoother(g)
    noisy = np.asarray(g_full.poses)
    for k in range(1, n):
        z = se2.between(jnp.asarray(gt[k - 1], dtype), jnp.asarray(gt[k], dtype))
        g = fct.add_pose(st.graph, jnp.asarray(noisy[k], dtype))
        g = fct.add_between(g, k - 1, k, z, sq)
        st = st._replace(graph=g,
                         last_max_delta=jnp.asarray(jnp.inf, dtype))
        st = inc.incremental_update(st, CFG)
    err = jnp.max(jnp.abs(st.graph.poses[:n, :2] - full.graph.poses[:n, :2]))
    assert float(err) < 0.02, float(err)


def test_fresh_residual_fast_path_skips_without_full_linearize():
    """A settled graph extended with ZERO-residual factors (the windowed
    odometry construction) must skip via the O(K) fresh-residual test."""
    g, gt = _chain_graph()
    res = slv.optimize(g, SolverConfig(max_iter=30), method="dense")
    g2 = res.graph
    # Append a factor that exactly matches the current estimate.
    z = se2.between(g2.poses[10], g2.poses[11])
    sq = jnp.asarray(np.diag([10.0, 10.0, 20.0]), jnp.float64)
    g2 = fct.add_between(g2, 10, 11, z, sq)
    assert float(inc.fresh_residual_max(g2)) < 1e-9
    st = inc.SmootherState(graph=g2, lam=jnp.asarray(1e-4, jnp.float64),
                           last_max_delta=jnp.asarray(1e-7, jnp.float64),
                           step=jnp.asarray(3, jnp.int32))
    st2 = inc.incremental_update(st, CFG)
    assert bool(jnp.all(st2.graph.poses == st.graph.poses))

    # A large-residual fresh factor must NOT skip.
    g3 = fct.add_between(res.graph, 5, 12,
                         jnp.asarray([9.0, 9.0, 1.0], jnp.float64), sq)
    assert float(inc.fresh_residual_max(g3)) > 1.0


def test_full_solve_every_triggers():
    """The periodic full solve must fire on the configured cadence and
    clean up accumulated error that tiny incremental budgets left behind."""
    g, gt = _chain_graph(noise=0.08)
    cfg = SolverConfig(inc_iters=1, pcg_max_iter=2, full_solve_every=4,
                       relin_threshold=1e-4, max_iter=25)
    st = inc.SmootherState(graph=g, lam=jnp.asarray(1e-4, jnp.float64),
                           last_max_delta=jnp.asarray(jnp.inf, jnp.float64),
                           step=jnp.asarray(2, jnp.int32))
    # One starved update (budget too small to converge)...
    st = inc.incremental_update(st, cfg)
    chi_starved = float(fct.chi2(st.graph))
    # ...then the cadence step (step becomes 4) runs the full solve.
    st = st._replace(last_max_delta=jnp.asarray(jnp.inf, jnp.float64))
    st = inc.incremental_update(st, cfg)
    assert int(st.step) == 4
    chi_full = float(fct.chi2(st.graph))
    # The full solve shares the starved pcg_max_iter, so it cannot reach the
    # dense optimum here — but it must clean up most of the leftover error.
    assert chi_full < 0.1 * chi_starved, (chi_full, chi_starved)


def test_marginal_covariance_shrinks_near_prior():
    g, gt = _chain_graph()
    res = slv.optimize(g, SolverConfig(max_iter=30), method="dense")
    c0 = inc.marginal_covariance(res.graph, 0)
    cN = inc.marginal_covariance(res.graph, 19)
    # Uncertainty grows along the chain away from the prior.
    assert float(jnp.trace(cN)) > float(jnp.trace(c0))


def test_marginal_covariance_pcg_matches_dense():
    """Unit-vector PCG marginals must match the dense H^{-1} block."""
    g, gt = _chain_graph()
    res = slv.optimize(g, SolverConfig(max_iter=30), method="dense")
    cfg = SolverConfig(pcg_max_iter=400, pcg_tol=1e-10)
    for idx in (0, 7, 19):
        dense = np.asarray(inc.marginal_covariance(res.graph, idx))
        pcgm = np.asarray(inc.marginal_covariance_pcg(res.graph, idx, cfg))
        np.testing.assert_allclose(pcgm, dense, rtol=1e-3, atol=1e-8)
