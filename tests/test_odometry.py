"""End-to-end NDT odometry integration test (BASELINE config 1 capability:
100-scan odometry, no loop closure) on the synthetic box world."""

import jax
import jax.numpy as jnp
import numpy as np

from ndtpu.config import GridConfig, KeyframeConfig, MatchConfig, NDTMapConfig
from ndtpu.data import synth
from ndtpu.eval import ate
from ndtpu.lie import se2
from ndtpu.slam import odometry

GRID = GridConfig(x0=-14.0, y0=-14.0, cell=0.7, nx=40, ny=40, overlap=4)


def test_odometry_beats_dead_reckoning():
    world = synth.box_world(half=12.0)
    poses = synth.rectangle_trajectory(100, half=6.0, step=0.22,
                                       dtype=jnp.float32)
    seq = synth.make_sequence(world, poses, n_beams=360, max_range=25.0,
                              min_range=0.1, seed=0, range_noise=0.01,
                              odom_trans_std=0.03, odom_rot_std=0.01)

    res = odometry.run_odometry(seq.points, seq.mask, seq.odom, GRID,
                                NDTMapConfig(), MatchConfig(),
                                KeyframeConfig(dist_thresh=0.4),
                                init_pose=poses[0])

    # Dead reckoning from the same noisy odometry.
    dr = [poses[0]]
    for t in range(1, 100):
        dr.append(se2.compose(dr[-1], seq.odom[t]))
    dr = jnp.stack(dr)

    ate_slam = float(ate.ate_rmse(res.poses, seq.gt_poses))
    ate_dr = float(ate.ate_rmse(dr, seq.gt_poses))
    assert np.mean(np.asarray(res.converged)) > 0.9
    assert ate_slam < 0.10, f"odometry ATE too high: {ate_slam}"
    assert ate_slam < 0.5 * ate_dr, (ate_slam, ate_dr)
    # Keyframes spawned at the expected density (~0.4 m spacing, 0.22 m step).
    n_kf = int(np.sum(np.asarray(res.is_keyframe)))
    assert 30 <= n_kf <= 80, n_kf


def test_odometry_is_deterministic():
    """Same input -> bit-identical trajectory (SURVEY.md §6 determinism)."""
    world = synth.box_world(half=12.0)
    poses = synth.rectangle_trajectory(30, half=6.0, dtype=jnp.float32)
    seq = synth.make_sequence(world, poses, n_beams=180, max_range=25.0,
                              min_range=0.1, seed=1)
    run = jax.jit(lambda p, mk, od: odometry.run_odometry(
        p, mk, od, GRID, NDTMapConfig(), MatchConfig(), KeyframeConfig(),
        init_pose=poses[0]).poses)
    p1 = run(seq.points, seq.mask, seq.odom)
    p2 = run(seq.points, seq.mask, seq.odom)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
