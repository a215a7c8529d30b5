"""Supernodal partitioned Cholesky vs dense reference (config 4 solver)."""

import jax.numpy as jnp
import numpy as np

from ndtpu.config import SolverConfig
from ndtpu.data import g2o
from ndtpu.graph import factors as fct
from ndtpu.graph import solve as slv
from ndtpu.graph import supernodal as sn


def _graph(n=240, seed=3):
    data = g2o.manhattan_world(n, seed=seed, loop_prob=0.15)
    g = g2o.to_graph(data, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    return g._replace(poses=g.poses + jnp.asarray(
        rng.normal(0, 0.03, g.poses.shape)))


def test_supernodal_delta_matches_dense():
    g = _graph()
    plan = sn.plan_supernodal(g, n_shards=8)
    lin = fct.linearize(g)
    lam = jnp.asarray(1e-3, jnp.float64)
    got = sn.supernodal_delta(g, lin, plan, lam)
    ref = slv.solve_dense(g, lin, lam)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-9)


def test_supernodal_delta_no_rcm():
    g = _graph(n=120)
    plan = sn.plan_supernodal(g, n_shards=4, use_rcm=False)
    lin = fct.linearize(g)
    lam = jnp.asarray(1e-2, jnp.float64)
    got = sn.supernodal_delta(g, lin, plan, lam)
    ref = slv.solve_dense(g, lin, lam)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-9)


def test_optimize_supernodal_reaches_dense_optimum():
    g = _graph(n=200)
    got = sn.optimize_supernodal(g, SolverConfig(max_iter=30), n_shards=8)
    ref = slv.optimize(g, SolverConfig(max_iter=30), method="dense")
    assert float(got.chi2) <= 1.02 * float(ref.chi2) + 1e-9, (
        float(got.chi2), float(ref.chi2))


def test_rcm_shrinks_separator():
    """The native RCM ordering must cut the separator vs natural order on a
    scrambled graph."""
    data = g2o.manhattan_world(300, seed=9, loop_prob=0.1)
    g = g2o.to_graph(data, dtype=jnp.float64)
    # Scramble pose labels to destroy natural contiguity.
    rng = np.random.default_rng(1)
    perm = rng.permutation(g.poses.shape[0]).astype(np.int32)
    g2_ = g._replace(
        poses=g.poses[jnp.asarray(np.argsort(perm))],
        bet_i=jnp.asarray(perm)[g.bet_i],
        bet_j=jnp.asarray(perm)[g.bet_j],
        prior_idx=jnp.asarray(perm)[g.prior_idx],
    )
    p_nat = sn.plan_supernodal(g2_, n_shards=8, use_rcm=False)
    p_rcm = sn.plan_supernodal(g2_, n_shards=8, use_rcm=True)
    assert p_rcm.schur.ns < p_nat.schur.ns, (p_rcm.schur.ns, p_nat.schur.ns)
