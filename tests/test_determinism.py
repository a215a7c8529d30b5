"""Determinism + numeric-sanitizer nets (SURVEY.md §6 "Race detection /
sanitizers"): JAX is functional so there are no data races; the equivalent
safety nets are (a) same seed -> bit-identical trajectory, and (b) the
pipeline stays NaN-free under jax_debug_nans."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndtpu.config import (GridConfig, KeyframeConfig, LoopConfig,
                          PipelineConfig, SolverConfig)
from ndtpu.data import synth
from ndtpu.slam import pipeline


def _cfg():
    return PipelineConfig(
        grid=GridConfig(x0=-12.0, y0=-12.0, cell=1.0, nx=24, ny=24,
                        overlap=4),
        keyframe=KeyframeConfig(dist_thresh=0.6, angle_thresh=0.3,
                                capacity=64),
        loop=LoopConfig(radius=3.0, min_index_gap=8, max_candidates=4,
                        local_half_extent=8.0),
        solver=SolverConfig(inc_iters=1, pcg_max_iter=40),
        use_loop_closure=True,
    )


def _seq(n=40):
    world = synth.box_world(half=9.0)
    traj = synth.rectangle_trajectory(n, half=6.0, step=0.25)
    return synth.make_sequence(world, traj, n_beams=90, max_range=15.0,
                               min_range=0.1, seed=11,
                               odom_trans_std=0.05, odom_rot_std=0.01)


def test_same_seed_bit_identical():
    seq = _seq()
    cfg = _cfg()
    s1, o1 = pipeline.run_slam(seq.points, seq.mask, seq.odom, cfg)
    s2, o2 = pipeline.run_slam(seq.points, seq.mask, seq.odom, cfg)
    np.testing.assert_array_equal(np.asarray(o1.pose), np.asarray(o2.pose))
    np.testing.assert_array_equal(np.asarray(s1.graph.poses),
                                  np.asarray(s2.graph.poses))
    np.testing.assert_array_equal(np.asarray(s1.stats.n),
                                  np.asarray(s2.stats.n))


def test_pipeline_nan_free_under_debug_nans():
    seq = _seq(25)
    cfg = _cfg()
    try:
        jax.config.update("jax_debug_nans", True)
        state, outs = pipeline.run_slam(seq.points, seq.mask, seq.odom, cfg)
        jax.block_until_ready(state.pose)
    finally:
        jax.config.update("jax_debug_nans", False)
    assert np.all(np.isfinite(np.asarray(outs.pose)))


def test_windowed_pipeline_same_seed_bit_identical():
    seq = _seq(33)
    cfg = _cfg()
    s1, o1 = pipeline.run_slam_windowed(seq.points, seq.mask, seq.odom, cfg)
    s2, o2 = pipeline.run_slam_windowed(seq.points, seq.mask, seq.odom, cfg)
    np.testing.assert_array_equal(np.asarray(o1.pose), np.asarray(o2.pose))
    np.testing.assert_array_equal(np.asarray(s1.graph.poses),
                                  np.asarray(s2.graph.poses))
    np.testing.assert_array_equal(np.asarray(s1.stats.n),
                                  np.asarray(s2.stats.n))
