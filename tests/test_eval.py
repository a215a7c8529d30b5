"""ATE / alignment unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ndtpu.eval import ate
from ndtpu.lie import se2
import pytest

# Quick tier (SURVEY.md §5 item 5 / VERDICT r5 task 9): core-math and
# solver tests fast enough for per-commit runs (`pytest -m quick`).
pytestmark = pytest.mark.quick


def test_ate_zero_for_identical():
    poses = jax.random.uniform(jax.random.PRNGKey(0), (50, 3), jnp.float64)
    assert float(ate.ate_rmse(poses, poses)) < 1e-12


def test_alignment_removes_rigid_offset():
    gt = jax.random.uniform(jax.random.PRNGKey(1), (100, 3), jnp.float64,
                            -10, 10)
    offset = jnp.asarray([3.0, -1.0, 0.8], jnp.float64)
    est = se2.compose(jnp.broadcast_to(offset, gt.shape), gt)
    assert float(ate.ate_rmse(est, gt, align=True)) < 1e-6
    assert float(ate.ate_rmse(est, gt, align=False)) > 1.0


def test_rpe_invariant_to_global_offset():
    gt = jax.random.uniform(jax.random.PRNGKey(2), (60, 3), jnp.float64, -5, 5)
    offset = jnp.asarray([1.0, 2.0, 0.3], jnp.float64)
    est = se2.compose(jnp.broadcast_to(offset, gt.shape), gt)
    t_rmse, r_rmse = ate.rpe(est, gt)
    assert float(t_rmse) < 1e-10 and float(r_rmse) < 1e-10
