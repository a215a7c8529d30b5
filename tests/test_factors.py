"""Factor Jacobians vs autodiff + graph container behavior (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndtpu.graph import factors as fct
import pytest

# Quick tier (SURVEY.md §5 item 5 / VERDICT r5 task 9): core-math and
# solver tests fast enough for per-commit runs (`pytest -m quick`).
pytestmark = pytest.mark.quick


def rand_pose(key):
    return jax.random.uniform(key, (3,), jnp.float64, -3.0, 3.0)


def test_between_jacobians_match_autodiff():
    keys = jax.random.split(jax.random.PRNGKey(0), 30)
    for k in range(0, 30, 3):
        pi = rand_pose(keys[k])
        pj = rand_pose(keys[k + 1])
        z = rand_pose(keys[k + 2])
        ji_a, jj_a = fct._between_jacobians(pi, pj)
        ji_n = jax.jacfwd(lambda p: fct.between_error(p, pj, z))(pi)
        jj_n = jax.jacfwd(lambda p: fct.between_error(pi, p, z))(pj)
        np.testing.assert_allclose(np.asarray(ji_a), np.asarray(ji_n),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(jj_a), np.asarray(jj_n),
                                   atol=1e-10)


def test_between_error_zero_at_measurement():
    from ndtpu.lie import se2
    pi = jnp.asarray([1.0, 2.0, 0.5], jnp.float64)
    z = jnp.asarray([0.7, -0.2, 0.3], jnp.float64)
    pj = se2.compose(pi, z)
    e = fct.between_error(pi, pj, z)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-12)


def test_info_to_sqrt_info():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(10, 3, 3))
    info = a @ a.transpose(0, 2, 1) + 0.5 * np.eye(3)
    r = fct.info_to_sqrt_info(jnp.asarray(info))
    np.testing.assert_allclose(
        np.einsum("fba,fbc->fac", np.asarray(r), np.asarray(r)), info,
        rtol=1e-9, atol=1e-9)
    # Upper triangular.
    assert np.allclose(np.tril(np.asarray(r), -1), 0.0)


def test_add_factors_and_chi2():
    from ndtpu.lie import se2
    g = fct.empty_graph(4, 2, 8, jnp.float64)
    poses = jnp.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0.1], [3, 0.1, 0.2]],
                        jnp.float64)
    g = g._replace(poses=poses, pose_mask=jnp.ones(4, bool),
                   n_poses=jnp.asarray(4, jnp.int32))
    eye = jnp.eye(3, dtype=jnp.float64)
    g = fct.add_prior(g, 0, poses[0], eye)
    for i in range(3):
        z = se2.between(poses[i], poses[i + 1])
        g = fct.add_between(g, i, i + 1, z, eye)
    # Graph is consistent: chi2 == 0.
    assert float(fct.chi2(g)) < 1e-20
    # Perturb one pose -> positive chi2, only where expected.
    g2 = g._replace(poses=g.poses.at[2, 0].add(0.5))
    assert float(fct.chi2(g2)) > 0.1


def test_capacity_overflow_is_dropped():
    g = fct.empty_graph(4, 1, 2, jnp.float64)
    eye = jnp.eye(3, dtype=jnp.float64)
    z = jnp.zeros(3, jnp.float64)
    for _ in range(5):
        g = fct.add_between(g, 0, 1, z, eye)
    assert int(g.n_between) == 2
    assert bool(jnp.all(g.bet_mask[:2])) and not bool(jnp.any(g.bet_mask[2:]))
