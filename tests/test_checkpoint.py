"""Checkpoint/resume: save -> restore -> continue must be bit-identical to
an uninterrupted run (SURVEY.md §6 determinism requirement)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ndtpu.config import (GridConfig, KeyframeConfig, LoopConfig, MatchConfig,
                          NDTMapConfig, PipelineConfig, SolverConfig)
from ndtpu.data import synth
from ndtpu.slam import pipeline
from ndtpu.utils import checkpoint as ckpt


def _cfg():
    return PipelineConfig(
        grid=GridConfig(x0=-12.0, y0=-12.0, cell=1.0, nx=24, ny=24, overlap=4),
        keyframe=KeyframeConfig(dist_thresh=0.6, angle_thresh=0.3,
                                capacity=64),
        loop=LoopConfig(radius=3.0, min_index_gap=8, max_candidates=4,
                        local_half_extent=8.0),
        solver=SolverConfig(inc_iters=1, pcg_max_iter=40),
        use_loop_closure=False,
    )


def test_save_restore_roundtrip(tmp_path):
    world = synth.box_world(half=9.0)
    traj = synth.rectangle_trajectory(30, half=6.0, step=0.2)
    seq = synth.make_sequence(world, traj, n_beams=90, max_range=15.0,
                              min_range=0.1, seed=1)
    cfg = _cfg()
    state = pipeline.init_slam(cfg, seq.points[0], seq.mask[0])
    for t in range(1, 15):
        state, _ = pipeline.slam_step_jit(state, seq.points[t], seq.mask[t],
                                      seq.odom[t], cfg)

    p = str(tmp_path / "state.npz")
    ckpt.save_state(p, state)
    restored = ckpt.restore_state(p, state)

    # Continue both to the end; trajectories must agree bit-for-bit.
    for t in range(15, 30):
        state, _ = pipeline.slam_step_jit(state, seq.points[t], seq.mask[t],
                                      seq.odom[t], cfg)
        restored, _ = pipeline.slam_step_jit(restored, seq.points[t], seq.mask[t],
                                         seq.odom[t], cfg)
    np.testing.assert_array_equal(np.asarray(state.pose),
                                  np.asarray(restored.pose))
    np.testing.assert_array_equal(np.asarray(state.graph.poses),
                                  np.asarray(restored.graph.poses))


def test_restore_shape_mismatch_rejected(tmp_path):
    p = str(tmp_path / "x.npz")
    ckpt.save_state(p, {"a": jnp.zeros((3,))})
    with pytest.raises(ValueError, match="checkpoint leaf"):
        ckpt.restore_state(p, {"a": jnp.zeros((4,))})


def test_manager_rotation(tmp_path):
    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"), every=2, keep=2)
    s = {"x": jnp.arange(4)}
    for step in range(1, 9):
        mgr.maybe_save(step, s)
    assert mgr.latest_step() == 8
    step, restored = mgr.restore_latest(s)
    assert step == 8
    np.testing.assert_array_equal(np.asarray(restored["x"]), np.arange(4))
