"""Full SLAM pipeline integration: loop closure must fire and improve the
trajectory on a synthetic looping sequence (SURVEY.md §5 item 3)."""

import jax.numpy as jnp
import pytest

from ndtpu.config import (GridConfig, KeyframeConfig, LoopConfig, MatchConfig,
                          NDTMapConfig, PipelineConfig, SolverConfig)
from ndtpu.data import synth
from ndtpu.eval.ate import ate_rmse
from ndtpu.slam import pipeline
from ndtpu.slam.odometry import run_odometry


def _cfg(use_loops: bool) -> PipelineConfig:
    return PipelineConfig(
        grid=GridConfig(x0=-12.0, y0=-12.0, cell=1.0, nx=24, ny=24, overlap=4),
        ndt=NDTMapConfig(),
        match=MatchConfig(),
        keyframe=KeyframeConfig(dist_thresh=0.6, angle_thresh=0.3,
                                capacity=128),
        loop=LoopConfig(radius=3.0, min_index_gap=8, max_candidates=4,
                        score_gate=0.30, local_half_extent=8.0,
                        local_cell=1.0),
        solver=SolverConfig(inc_iters=2, pcg_max_iter=60),
        use_loop_closure=use_loops,
    )


@pytest.fixture(scope="module")
def loop_sequence():
    world = synth.box_world(half=9.0)
    traj = synth.rectangle_trajectory(135, half=6.0, step=0.2)
    return synth.make_sequence(world, traj, n_beams=180, max_range=15.0,
                               min_range=0.1, seed=3, range_noise=0.01,
                               odom_trans_std=0.05, odom_rot_std=0.01)


def test_pipeline_closes_loops_and_beats_odometry(loop_sequence):
    seq = loop_sequence
    cfg = _cfg(True)
    state, outs = pipeline.run_slam(seq.points, seq.mask, seq.odom, cfg)
    assert int(state.n_loops) > 0, "no loop closures fired on a loop sequence"
    traj = pipeline.recover_trajectory(state, outs)
    ate_slam = float(ate_rmse(traj, seq.gt_poses))
    assert ate_slam < 0.25, ate_slam
    # Per-scan estimates must be finite and keyframes spawned.
    assert int(jnp.sum(outs.is_keyframe)) > 10
    assert not bool(jnp.any(jnp.isnan(traj)))


def test_windowed_pipeline_matches_sequential(loop_sequence):
    """run_slam_windowed (VERDICT r2 item 1) reproduces the sequential
    pipeline's quality: loops fire, ATE comparable, trajectory finite."""
    seq = loop_sequence
    cfg = _cfg(True)
    st_s, outs_s = pipeline.run_slam(seq.points, seq.mask, seq.odom, cfg)
    ate_s = float(ate_rmse(pipeline.recover_trajectory(st_s, outs_s),
                           seq.gt_poses))
    st_w, outs_w = pipeline.run_slam_windowed(seq.points, seq.mask, seq.odom,
                                              cfg)
    traj_w = pipeline.recover_trajectory(st_w, outs_w)
    ate_w = float(ate_rmse(traj_w, seq.gt_poses))
    assert int(st_w.n_loops) > 0, "windowed pipeline closed no loops"
    assert ate_w < max(1.5 * ate_s, 0.25), (ate_w, ate_s)
    assert not bool(jnp.any(jnp.isnan(traj_w)))
    assert traj_w.shape == (seq.points.shape[0], 3)
    # Keyframe graph grew to a comparable size.
    assert abs(int(st_w.graph.n_poses) - int(st_s.graph.n_poses)) <= 8


def test_windowed_pipeline_no_loops(loop_sequence):
    seq = loop_sequence
    cfg = _cfg(False)
    st, outs = pipeline.run_slam_windowed(seq.points, seq.mask, seq.odom, cfg)
    assert int(st.n_loops) == 0
    traj = pipeline.recover_trajectory(st, outs)
    assert float(ate_rmse(traj, seq.gt_poses)) < 0.6


def test_pipeline_no_loops_matches_odometry_mode(loop_sequence):
    seq = loop_sequence
    cfg = _cfg(False)
    state, outs = pipeline.run_slam(seq.points, seq.mask, seq.odom, cfg)
    assert int(state.n_loops) == 0
    traj = pipeline.recover_trajectory(state, outs)
    ate = float(ate_rmse(traj, seq.gt_poses))
    assert ate < 0.6, ate  # pure odometry should still track reasonably


def test_windowed_pipeline_capacity_overflow_is_graceful(loop_sequence):
    """Keyframe/graph capacity far below demand: appends must drop cleanly
    (no NaNs, counters clamped, trajectory still finite)."""
    seq = loop_sequence
    cfg = _cfg(False)
    import dataclasses
    from ndtpu.config import KeyframeConfig
    cfg = dataclasses.replace(
        cfg, keyframe=KeyframeConfig(dist_thresh=0.6, angle_thresh=0.3,
                                     capacity=8))
    st, outs = pipeline.run_slam_windowed(seq.points, seq.mask, seq.odom, cfg)
    assert int(st.kf.n) <= 8
    assert int(st.graph.n_poses) <= 8
    traj = pipeline.recover_trajectory(st, outs)
    assert not bool(jnp.any(jnp.isnan(traj)))
    assert traj.shape == (seq.points.shape[0], 3)


def test_capacity_saturation_is_reported():
    """VERDICT r3 weak 6: a run whose keyframe/factor stores fill must
    REPORT drops via SlamStepOut.n_dropped instead of silently degrading."""
    import jax
    import numpy as np

    from ndtpu.config import (GridConfig, KeyframeConfig, LoopConfig,
                              PipelineConfig)
    from ndtpu.data import synth

    world = synth.box_world(half=11.0)
    traj = synth.rectangle_trajectory(96, half=7.0, step=0.3)
    seq = synth.make_sequence(world, traj, n_beams=120, max_range=20.0,
                              min_range=0.1, seed=2)
    cfg = PipelineConfig(
        grid=GridConfig(x0=-14.0, y0=-14.0, cell=1.0, nx=28, ny=28,
                        overlap=4),
        keyframe=KeyframeConfig(dist_thresh=0.5, angle_thresh=0.3,
                                capacity=8),     # ~1/6 of what the run needs
        loop=LoopConfig(max_candidates=4, local_half_extent=6.0),
        n_beams=120, use_loop_closure=False, window=8, window_passes=2)
    st, outs = pipeline.run_slam_windowed(seq.points, seq.mask, seq.odom,
                                          cfg)
    drops = int(np.asarray(outs.n_dropped).sum())
    assert drops > 0, "capacity-starved run reported zero drops"
    # The store really is full and the counter reflects real losses.
    assert int(st.kf.n) == 8
    # Ample capacity -> zero drops.
    cfg2 = PipelineConfig(
        grid=GridConfig(x0=-14.0, y0=-14.0, cell=1.0, nx=28, ny=28,
                        overlap=4),
        keyframe=KeyframeConfig(dist_thresh=0.5, angle_thresh=0.3,
                                capacity=96),
        loop=LoopConfig(max_candidates=4, local_half_extent=6.0),
        n_beams=120, use_loop_closure=False, window=8, window_passes=2)
    st2, outs2 = pipeline.run_slam_windowed(seq.points, seq.mask, seq.odom,
                                            cfg2)
    assert int(np.asarray(outs2.n_dropped).sum()) == 0
