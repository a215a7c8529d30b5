"""Synthetic simulator sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ndtpu.data import synth
import pytest

# Quick tier (SURVEY.md §5 item 5 / VERDICT r5 task 9): core-math and
# solver tests fast enough for per-commit runs (`pytest -m quick`).
pytestmark = pytest.mark.quick


def test_raycast_known_geometry():
    # Single wall at x = 5; beam along +x from origin must return 5.
    world = synth.World(segments=jnp.asarray([[[5.0, -10.0], [5.0, 10.0]]]))
    pose = jnp.zeros(3)
    angles = jnp.asarray([0.0, np.pi / 4, np.pi])  # +x, diagonal, -x
    r = synth.raycast(world, pose, angles, max_range=20.0)
    np.testing.assert_allclose(float(r[0]), 5.0, atol=1e-6)
    np.testing.assert_allclose(float(r[1]), 5.0 * np.sqrt(2), atol=1e-5)
    assert float(r[2]) == 20.0  # miss


def test_raycast_respects_pose():
    world = synth.World(segments=jnp.asarray([[[5.0, -10.0], [5.0, 10.0]]]))
    pose = jnp.asarray([2.0, 0.0, 0.0])
    r = synth.raycast(world, pose, jnp.asarray([0.0]), max_range=20.0)
    np.testing.assert_allclose(float(r[0]), 3.0, atol=1e-6)
    # Rotated 90deg: beam now along +y, misses the wall.
    pose = jnp.asarray([2.0, 0.0, np.pi / 2])
    r = synth.raycast(world, pose, jnp.asarray([0.0]), max_range=20.0)
    assert float(r[0]) == 20.0


def test_box_world_scan_inside():
    world = synth.box_world(half=10.0)
    angles = synth.beam_angles(180)
    r = synth.raycast(world, jnp.zeros(3), angles, max_range=50.0)
    assert np.all(np.asarray(r) <= 10.0 * np.sqrt(2) + 1e-3)
    assert np.all(np.asarray(r) > 0.5)


def test_polar_to_xy_masks():
    angles = jnp.asarray([0.0, np.pi / 2])
    ranges = jnp.asarray([[2.0, 20.0]])
    pts, mask = synth.polar_to_xy(ranges, angles, 0.1, 20.0)
    np.testing.assert_allclose(np.asarray(pts[0, 0]), [2.0, 0.0], atol=1e-6)
    assert bool(mask[0, 0]) and not bool(mask[0, 1])  # max-range filtered


def test_noisy_odometry_composes_to_trajectory():
    poses = synth.rectangle_trajectory(50, half=6.0, dtype=jnp.float64)
    odom = synth.noisy_odometry(poses, jax.random.PRNGKey(0), 0.0, 0.0)
    # Noise-free: dead reckoning reproduces the trajectory exactly.
    from ndtpu.lie import se2
    cur = poses[0]
    for t in range(1, 50):
        cur = se2.compose(cur, odom[t])
        np.testing.assert_allclose(np.asarray(cur), np.asarray(poses[t]),
                                   atol=1e-9)


def test_make_sequence_shapes():
    world = synth.box_world()
    poses = synth.rectangle_trajectory(20, half=6.0)
    seq = synth.make_sequence(world, poses, n_beams=90, max_range=20.0,
                              min_range=0.1)
    assert seq.points.shape == (20, 90, 2)
    assert seq.mask.shape == (20, 90)
    assert seq.odom.shape == (20, 3)
    assert bool(jnp.all(seq.mask.sum(axis=1) > 30))
