"""Keyframe store: masked append semantics (SURVEY.md §8 hard part #1)."""

import jax.numpy as jnp

from ndtpu.slam import keyframes as kfs
import pytest

# Quick tier (SURVEY.md §5 item 5 / VERDICT r5 task 9): core-math and
# solver tests fast enough for per-commit runs (`pytest -m quick`).
pytestmark = pytest.mark.quick


def _mk(cap=4, n=8):
    return kfs.empty_store(cap, n, jnp.float32)


def test_append_and_capacity():
    kf = _mk(cap=2)
    p = jnp.ones((8, 2))
    m = jnp.ones((8,), bool)
    kf = kfs.add_keyframe(kf, jnp.asarray([1.0, 2.0, 0.5]), p, m)
    assert int(kf.n) == 1
    assert bool(kf.live[0]) and not bool(kf.live[1])
    assert jnp.allclose(kf.poses[0], jnp.asarray([1.0, 2.0, 0.5]))

    kf = kfs.add_keyframe(kf, jnp.asarray([3.0, 0.0, 0.0]), p, m)
    assert int(kf.n) == 2
    # overflow: dropped, store unchanged
    kf2 = kfs.add_keyframe(kf, jnp.asarray([9.0, 9.0, 9.0]), p, m)
    assert int(kf2.n) == 2
    assert jnp.allclose(kf2.poses, kf.poses)


def test_disabled_append_is_noop():
    kf = _mk()
    p = jnp.zeros((8, 2))
    m = jnp.zeros((8,), bool)
    kf2 = kfs.add_keyframe(kf, jnp.asarray([1.0, 1.0, 1.0]), p, m,
                           enabled=jnp.asarray(False))
    assert int(kf2.n) == 0
    assert not bool(kf2.live[0])
