"""Incremental smoother: bounded-cost updates match full solves
(SURVEY.md §8 Phase C — the iSAM2-capability re-engineering)."""

import jax.numpy as jnp
import numpy as np

from ndtpu.config import SolverConfig
from ndtpu.data import g2o
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


def _padded(g, extra_v=16, extra_f=32):
    """Copy a PoseGraph into one with spare capacity for appends."""
    import jax.numpy as jnp
    v, p, f = (g.poses.shape[0], g.prior_mask.shape[0],
               g.bet_mask.shape[0])
    big = fct.empty_graph(v + extra_v, p, f + extra_f, g.poses.dtype)
    return big._replace(
        poses=big.poses.at[:v].set(g.poses),
        pose_mask=big.pose_mask.at[:v].set(g.pose_mask),
        prior_idx=g.prior_idx, prior_z=g.prior_z,
        prior_sqrt_info=g.prior_sqrt_info, prior_mask=g.prior_mask,
        bet_i=big.bet_i.at[:f].set(g.bet_i),
        bet_j=big.bet_j.at[:f].set(g.bet_j),
        bet_z=big.bet_z.at[:f].set(g.bet_z),
        bet_sqrt_info=big.bet_sqrt_info.at[:f].set(g.bet_sqrt_info),
        bet_mask=big.bet_mask.at[:f].set(g.bet_mask),
        n_poses=g.n_poses, n_priors=g.n_priors, n_between=g.n_between)


def _settled_graph_with_chain(n=600, chain=5):
    from ndtpu.lie import se2
    data = g2o.manhattan_world(n, seed=0, loop_prob=0.05)
    g = _padded(g2o.to_graph(data, dtype=jnp.float32))
    sol = slv.optimize(g, SolverConfig(max_iter=30, pcg_max_iter=200),
                       method="pcg")
    g = sol.graph
    since = g.n_between
    last = int(g.n_poses) - 1
    for k in range(chain):
        idx = int(g.n_poses)
        prev = g.poses[last + k]
        z = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
        newp = se2.compose(prev,
                           z + jnp.asarray([0.05, -0.03, 0.01], jnp.float32))
        g = fct.add_pose(g, newp)
        g = fct.add_between(g, last + k, idx, z,
                            jnp.eye(3, dtype=jnp.float32) * 10.0)
    return g, since, last


def test_local_update_matches_global_on_fresh_chain():
    """k-hop local update (iSAM2 clique-local capability, VERDICT r3 weak
    5): after appending a short odometry chain to a settled graph, the
    bounded local solve must reach the same correction as the global
    warm-started update on the new poses."""
    g, since, last = _settled_graph_with_chain()
    cfg = SolverConfig()
    act, touch, ok = inc._active_probe(g, cfg, since)
    assert bool(ok)
    assert 0 < int(jnp.sum(act)) <= cfg.local_poses
    chi0 = float(fct.chi2(g))
    gl, lam, md = inc.local_update(g, jnp.asarray(1e-4, jnp.float32), cfg,
                                   since=since)
    chi_l = float(fct.chi2(gl))
    st = inc.SmootherState(graph=g, lam=jnp.asarray(1e-4, jnp.float32),
                           last_max_delta=jnp.asarray(jnp.inf, jnp.float32),
                           step=jnp.asarray(0, jnp.int32))
    st_g = inc.incremental_update(st, SolverConfig(local_poses=0,
                                                   inc_iters=2))
    chi_g = float(fct.chi2(st_g.graph))
    assert chi_l < chi0
    assert chi_l < chi_g * 1.05 + 1e-3, (chi0, chi_l, chi_g)
    # The fits are chi-equivalent; pose placement differs by the held-fixed
    # boundary (the same thresholded-relinearization approximation iSAM2
    # makes — corrections beyond the active set arrive in later updates /
    # the periodic full solve). Sanity-bound the placement difference.
    sl_new = slice(last + 1, last + 6)
    np.testing.assert_allclose(np.asarray(gl.poses[sl_new]),
                               np.asarray(st_g.graph.poses[sl_new]),
                               atol=0.2)


def test_local_update_falls_back_on_loop_factor():
    """A fresh loop factor whose cycle is too long for ``local_poses``
    must force the global path: the correction propagates around the
    whole cycle, and here the cycle (~595 poses) overflows the 128-slot
    active-set capacity (short cycles are admitted instead — see
    test_local_update_admits_short_cycle)."""
    g, since, last = _settled_graph_with_chain()
    # Append a loop factor back to a far-away pose.
    z = jnp.zeros(3, jnp.float32)
    g2 = fct.add_between(g, 10, int(g.n_poses) - 1, z,
                         jnp.eye(3, dtype=jnp.float32))
    _, _, ok = inc._active_probe(g2, SolverConfig(), since)
    assert not bool(ok)
    # And the dispatching incremental_update still reduces chi2.
    st = inc.SmootherState(graph=g2, lam=jnp.asarray(1e-4, jnp.float32),
                           last_max_delta=jnp.asarray(jnp.inf, jnp.float32),
                           step=jnp.asarray(0, jnp.int32))
    chi0 = float(fct.chi2(g2))
    st2 = inc.incremental_update(st, SolverConfig(),
                                 fresh_since=since)
    assert float(fct.chi2(st2.graph)) < chi0


def test_local_update_noop_when_nothing_fresh():
    g, since, last = _settled_graph_with_chain(chain=0)
    cfg = SolverConfig()
    act, touch, ok = inc._active_probe(g, cfg, g.n_between)
    assert bool(ok) and int(jnp.sum(act)) == 0
    gl, lam, md = inc.local_update(g, jnp.asarray(1e-4, jnp.float32), cfg,
                                   since=g.n_between)
    np.testing.assert_array_equal(np.asarray(gl.poses),
                                  np.asarray(g.poses))


def test_local_update_admits_short_cycle():
    """A fresh loop factor whose CYCLE fits ``local_poses`` engages the
    local path (VERDICT r4 missing #5: in loop-dense stretches the
    bounded-cost property must not disengage): the probe seeds the
    contiguous index interval between the endpoints, ok stays True, the
    dispatcher takes the local path (take=2), and the fit is
    chi-equivalent to the global update."""
    from ndtpu.lie import se2

    g, since, last = _settled_graph_with_chain()
    # Loop factor back ~45 indices inside the fresh-chain neighborhood:
    # span > local_span_gap (20) but interval + 2 hops << local_poses.
    a, b = last - 40, int(g.n_poses) - 1
    z = se2.between(g.poses[a], g.poses[b]) + jnp.asarray(
        [0.03, -0.02, 0.01], jnp.float32)
    g2 = fct.add_between(g, a, b, z, jnp.eye(3, dtype=jnp.float32) * 5.0)
    cfg = SolverConfig()
    act, touch, ok = inc._active_probe(g2, cfg, since)
    assert bool(ok), "short cycle must stay locally viable"
    # The seeded interval covers the cycle's poses.
    assert bool(jnp.all(act[a:b + 1]))
    assert int(jnp.sum(act)) <= cfg.local_poses
    st = inc.SmootherState(graph=g2, lam=jnp.asarray(1e-4, jnp.float32),
                           last_max_delta=jnp.asarray(jnp.inf, jnp.float32),
                           step=jnp.asarray(0, jnp.int32))
    chi0 = float(fct.chi2(g2))
    st_l, take = inc.incremental_update(st, cfg, fresh_since=since,
                                        return_take=True)
    assert int(take) == 2, "dispatcher must take the local path"
    chi_l = float(fct.chi2(st_l.graph))
    st_g = inc.incremental_update(st, SolverConfig(local_poses=0,
                                                   inc_iters=2))
    chi_g = float(fct.chi2(st_g.graph))
    assert chi_l < chi0
    assert chi_l < chi_g * 1.05 + 1e-3, (chi0, chi_l, chi_g)
