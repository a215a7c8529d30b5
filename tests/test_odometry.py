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


def test_windowed_odometry_matches_sequential():
    """The window-batched front end (VERDICT r2 item 1) must reproduce the
    sequential path's accuracy: same world, ATE within 2x and absolutely
    small, similar keyframe density."""
    world = synth.box_world(half=12.0)
    poses = synth.rectangle_trajectory(97, half=6.0, step=0.22,
                                       dtype=jnp.float32)
    seq = synth.make_sequence(world, poses, n_beams=360, max_range=25.0,
                              min_range=0.1, seed=0, range_noise=0.01,
                              odom_trans_std=0.03, odom_rot_std=0.01)
    args = (seq.points, seq.mask, seq.odom, GRID, NDTMapConfig(),
            MatchConfig(), KeyframeConfig(dist_thresh=0.4))
    res_s = odometry.run_odometry(*args, init_pose=poses[0])
    ate_s = float(ate.ate_rmse(res_s.poses, seq.gt_poses))
    for window in (8, 16):  # 96 steps: divisible and non-divisible + padding
        res_w = odometry.run_odometry_windowed(*args, window=window,
                                               passes=2, init_pose=poses[0])
        ate_w = float(ate.ate_rmse(res_w.poses, seq.gt_poses))
        assert ate_w < max(2.0 * ate_s, 0.08), (window, ate_w, ate_s)
        n_kf_s = int(np.sum(np.asarray(res_s.is_keyframe)))
        n_kf_w = int(np.sum(np.asarray(res_w.is_keyframe)))
        assert abs(n_kf_w - n_kf_s) <= max(5, n_kf_s // 4), (n_kf_w, n_kf_s)
        assert res_w.poses.shape == res_s.poses.shape


def test_windowed_odometry_padding_is_inert():
    """A step count that does not divide the window must give the same
    result as the same data without padding pressure (pad scans carry
    all-false masks and identity deltas)."""
    world = synth.box_world(half=10.0)
    poses = synth.rectangle_trajectory(22, half=5.0, dtype=jnp.float32)
    seq = synth.make_sequence(world, poses, n_beams=120, max_range=20.0,
                              min_range=0.1, seed=2)
    res = odometry.run_odometry_windowed(
        seq.points, seq.mask, seq.odom, GRID, NDTMapConfig(), MatchConfig(),
        KeyframeConfig(), window=8, passes=2, init_pose=poses[0])
    assert res.poses.shape == (22, 3)
    assert not bool(jnp.any(jnp.isnan(res.poses)))
    # Padded tail did not spawn keyframes beyond the real scans.
    assert res.is_keyframe.shape == (22,)


def test_odometry_gate_rejects_wild_jumps():
    """gate_poses: a converged registration far from its odometry init is
    replaced by the init (PipelineConfig.odom_gate)."""
    res_pose = jnp.asarray([[5.0, 0.0, 0.1], [1.05, 0.0, 0.0]])
    conv = jnp.asarray([True, True])
    inits = jnp.asarray([[1.0, 0.0, 0.1], [1.0, 0.0, 0.0]])
    gated, ok = odometry.gate_poses(res_pose, conv, inits, 1.0)
    np.testing.assert_allclose(np.asarray(gated[0]), [1.0, 0.0, 0.1])
    np.testing.assert_allclose(np.asarray(gated[1]), [1.05, 0.0, 0.0])
    assert not bool(ok[0]) and bool(ok[1])
    # gate=0 disables: only convergence matters.
    gated2, ok2 = odometry.gate_poses(res_pose, conv, inits, 0.0)
    np.testing.assert_allclose(np.asarray(gated2[0]), [5.0, 0.0, 0.1])


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
