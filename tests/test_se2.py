"""SE(2) unit tests: group axioms, exp/log, adjoint, transforms.

Follows the upstream-GTSAM testing pattern (SURVEY.md §5 item 1): closed-form
identities + numerical-derivative cross-checks, f64.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ndtpu.lie import se2
import pytest

# Quick tier (SURVEY.md §5 item 5 / VERDICT r5 task 9): core-math and
# solver tests fast enough for per-commit runs (`pytest -m quick`).
pytestmark = pytest.mark.quick


def rand_poses(key, n):
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (n, 2), jnp.float64, -10.0, 10.0)
    th = jax.random.uniform(k2, (n, 1), jnp.float64, -np.pi, np.pi)
    return jnp.concatenate([xy, th], axis=-1)


def test_group_axioms():
    key = jax.random.PRNGKey(0)
    a = rand_poses(key, 64)
    b = rand_poses(jax.random.PRNGKey(1), 64)
    c = rand_poses(jax.random.PRNGKey(2), 64)
    ident = jnp.zeros((64, 3))
    np.testing.assert_allclose(se2.compose(a, ident), a, atol=1e-12)
    np.testing.assert_allclose(se2.compose(ident, a), a, atol=1e-12)
    np.testing.assert_allclose(
        se2.compose(a, se2.inverse(a)), ident, atol=1e-12)
    # Associativity.
    np.testing.assert_allclose(
        se2.compose(se2.compose(a, b), c), se2.compose(a, se2.compose(b, c)),
        atol=1e-12)
    # between(a, b) composed back onto a gives b.
    np.testing.assert_allclose(
        se2.compose(a, se2.between(a, b)), b, atol=1e-12)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(3)
    xi = jax.random.uniform(key, (128, 3), jnp.float64, -2.0, 2.0)
    np.testing.assert_allclose(se2.logmap(se2.expmap(xi)), xi, atol=1e-10)
    poses = rand_poses(jax.random.PRNGKey(4), 128)
    np.testing.assert_allclose(
        se2.expmap(se2.logmap(poses)), poses, atol=1e-10)
    # Small-angle series branch.
    xi_small = xi.at[:, 2].multiply(1e-6)
    np.testing.assert_allclose(
        se2.logmap(se2.expmap(xi_small)), xi_small, atol=1e-10)


def test_expmap_matches_ode_integration():
    """exp(xi) equals integrating the constant twist — oracle check."""
    xi = jnp.asarray([0.7, -0.3, 0.9], jnp.float64)
    n = 200000
    step = se2.expmap(xi / n)  # first-order is exact in the limit
    pose = jnp.zeros(3)
    mat = np.eye(3)
    c, s = np.cos(step[2]), np.sin(step[2])
    m = np.array([[c, -s, step[0]], [s, c, step[1]], [0, 0, 1]])
    full = np.linalg.matrix_power(m, n)
    expected = np.array([full[0, 2], full[1, 2], np.arctan2(full[1, 0], full[0, 0])])
    np.testing.assert_allclose(se2.expmap(xi), expected, atol=1e-8)


def test_adjoint_identity():
    """T * exp(xi) * T^-1 == exp(Ad_T xi)."""
    t = rand_poses(jax.random.PRNGKey(5), 32)
    xi = jax.random.uniform(jax.random.PRNGKey(6), (32, 3), jnp.float64, -1, 1)
    lhs = se2.compose(se2.compose(t, se2.expmap(xi)), se2.inverse(t))
    rhs = se2.expmap(jnp.einsum("nij,nj->ni", se2.adjoint(t), xi))
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_transform_roundtrip_and_consistency():
    pose = jnp.asarray([1.0, -2.0, 0.7], jnp.float64)
    pts = jax.random.uniform(jax.random.PRNGKey(7), (50, 2), jnp.float64, -5, 5)
    world = se2.transform(pose, pts)
    np.testing.assert_allclose(se2.transform_inv(pose, world), pts, atol=1e-12)
    # Against explicit rotation matrix.
    r = se2.rotmat(pose[2])
    np.testing.assert_allclose(world, pts @ np.asarray(r).T + pose[:2],
                               atol=1e-12)


def test_wrap():
    th = jnp.asarray([0.0, np.pi, -np.pi + 1e-9, 3 * np.pi, -3 * np.pi + 0.1])
    w = se2.wrap(th)
    assert np.all(np.asarray(w) <= np.pi + 1e-12)
    assert np.all(np.asarray(w) > -np.pi - 1e-12)
    np.testing.assert_allclose(np.cos(w), np.cos(th), atol=1e-12)
    np.testing.assert_allclose(np.sin(w), np.sin(th), atol=1e-12)
