"""f32-at-scale solver validation (SURVEY.md §8 hard part #3, VERDICT r2
item 6): the f32 fast path on a 10k-pose Manhattan graph must land at the
f64 optimum of the same algorithm.

Empirical note recorded here for the record: at 10k poses the block-Jacobi
PCG path needs NO extra Jacobi scaling — the 3x3 block preconditioner
(inverse damped diagonal blocks) already equilibrates the normal equations,
and f32 lands within 1e-3 relative chi^2 and <1 mm of the f64 solution
(measured: chi^2 1089.9259 vs 1089.9246, max pose diff 0.17 mm).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ndtpu.config import SolverConfig
from ndtpu.data import g2o
from ndtpu.graph import factors as fct
from ndtpu.graph import solve as slv
from ndtpu.graph import supernodal as sn

N_POSES = 10000


@pytest.fixture(scope="module")
def manhattan():
    data = g2o.manhattan_world(N_POSES, seed=0, loop_prob=0.1)
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 0.05, data.poses.shape)
    return data, noise


def _graph(manhattan, dtype):
    data, noise = manhattan
    g = g2o.to_graph(data, dtype=dtype)
    return g._replace(poses=g.poses + jnp.asarray(noise, dtype))


def _chi2_f64(manhattan, poses):
    data, _ = manhattan
    g64 = g2o.to_graph(data, dtype=jnp.float64)
    return float(fct.chi2(g64._replace(
        poses=jnp.asarray(poses, jnp.float64))))


def test_pcg_f32_matches_f64_at_10k(manhattan):
    cfg = SolverConfig(max_iter=15, pcg_max_iter=250, pcg_tol=1e-6)
    res64 = slv.optimize(_graph(manhattan, jnp.float64), cfg, method="pcg")
    res32 = slv.optimize(_graph(manhattan, jnp.float32), cfg, method="pcg")
    chi64 = _chi2_f64(manhattan, res64.graph.poses)
    chi32 = _chi2_f64(manhattan, res32.graph.poses)
    # f32 chi^2 (evaluated in f64) within 0.1% of the f64 optimum.
    assert chi32 <= 1.001 * chi64 + 1e-6, (chi32, chi64)
    d = np.abs(np.asarray(res32.graph.poses) - np.asarray(res64.graph.poses))
    assert d[:, :2].max() < 5e-3, d[:, :2].max()       # < 5 mm
    assert d[:, 2].max() < 5e-4, d[:, 2].max()         # < 0.5 mrad


def test_supernodal_f32_step_matches_f64(manhattan):
    """One supernodal partitioned-Cholesky GN step: f32 vs f64 deltas."""
    g64 = _graph(manhattan, jnp.float64)
    g32 = _graph(manhattan, jnp.float32)
    plan = sn.plan_supernodal(g32, 64)
    lam64 = jnp.asarray(1e-3, jnp.float64)
    lam32 = jnp.asarray(1e-3, jnp.float32)
    d64 = np.asarray(sn.supernodal_delta(g64, fct.linearize(g64), plan,
                                         lam64))
    d32 = np.asarray(sn.supernodal_delta(g32, fct.linearize(g32), plan,
                                         lam32))
    scale = np.abs(d64).max()
    assert scale > 0
    # f32 factorization error stays ~1e-4 relative to the step magnitude.
    assert np.abs(d32 - d64).max() < 1e-3 * max(scale, 1.0), (
        np.abs(d32 - d64).max(), scale)
