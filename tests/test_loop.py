"""Loop-closure detection: candidate gating + batched NDT verification
against ground truth in a synthetic world (SURVEY.md §5 item 3)."""

import jax
import jax.numpy as jnp

from ndtpu.config import LoopConfig, MatchConfig, NDTMapConfig
from ndtpu.data import synth
from ndtpu.lie import se2
from ndtpu.loop import closure
from ndtpu.slam import keyframes as kfs

LOOP = LoopConfig(radius=4.0, min_index_gap=3, max_candidates=4,
                  score_gate=0.3, local_half_extent=8.0, local_cell=0.8)


def _store_along_line(world, n_kf=8, spacing=1.0, n_beams=180):
    """Keyframes marching +x through the world, exact poses."""
    angles = synth.beam_angles(n_beams)
    kf = kfs.empty_store(n_kf + 4, n_beams, jnp.float32)
    poses = []
    for k in range(n_kf):
        pose = jnp.asarray([k * spacing - 4.0, 0.0, 0.0], jnp.float32)
        r = synth.simulate_scans(world, pose[None], angles, 15.0, 0.005,
                                 jax.random.PRNGKey(k))[0]
        pts, msk = synth.polar_to_xy(r, angles, 0.1, 15.0)
        kf = kfs.add_keyframe(kf, pose, pts, msk)
        poses.append(pose)
    return kf, poses, angles


def test_find_candidates_gap_and_radius():
    world = synth.box_world(half=10.0)
    kf, poses, _ = _store_along_line(world)
    # Query at keyframe 1's position with query index 8: gap excludes 6, 7.
    c = closure.find_candidates(kf, poses[1], jnp.asarray(8, jnp.int32), LOOP)
    got = set(int(i) for i, m in zip(c.idx, c.mask) if bool(m))
    # Eligible: within 4 m of x=-3 AND index gap >= 3 -> keyframes 0..5;
    # top-4 nearest by distance |k-1| -> {1, 0, 2, 3}.
    assert got == {0, 1, 2, 3}


def test_verify_recovers_relative_pose():
    world = synth.box_world(half=10.0)
    kf, poses, angles = _store_along_line(world)
    # True query pose near keyframe 2, offset by a known delta.
    true_pose = jnp.asarray([-2.0 + 0.3, 0.2, 0.1], jnp.float32)
    r = synth.simulate_scans(world, true_pose[None], angles, 15.0, 0.005,
                             jax.random.PRNGKey(99))[0]
    qpts, qmsk = synth.polar_to_xy(r, angles, 0.1, 15.0)
    # Odometry-drifted belief of the query pose (what SLAM would have).
    drifted = true_pose + jnp.asarray([0.25, -0.2, 0.05], jnp.float32)

    res = closure.detect_loops(kf, qpts, qmsk, drifted,
                               jnp.asarray(8, jnp.int32), LOOP,
                               NDTMapConfig(), MatchConfig())
    assert bool(jnp.any(res.accept)), res.score
    # Every accepted loop's measurement must map kf pose -> true query pose.
    for c in range(LOOP.max_candidates):
        if not bool(res.accept[c]):
            continue
        est_world = se2.compose(kf.poses[res.j[c]], res.z[c])
        err = jnp.abs(est_world - true_pose)
        # Gate-stage accuracy: ~cell/5 suffices (the smoother weighs the
        # factor by its Hessian; eig_abs_min floors sigma at 0.1 m).
        assert float(err[0]) < 0.2 and float(err[1]) < 0.2, (c, est_world)
        assert float(err[2]) < 0.05


def test_no_candidates_all_rejected():
    world = synth.box_world(half=10.0)
    kf, poses, angles = _store_along_line(world)
    far = jnp.asarray([50.0, 50.0, 0.0], jnp.float32)
    c = closure.find_candidates(kf, far, jnp.asarray(8, jnp.int32), LOOP)
    assert not bool(jnp.any(c.mask))
    r = synth.simulate_scans(world, far[None], angles, 15.0, 0.005,
                             jax.random.PRNGKey(1))[0]
    qpts, qmsk = synth.polar_to_xy(r, angles, 0.1, 15.0)
    res = closure.verify_candidates(kf, qpts, qmsk, far, c, LOOP,
                                    NDTMapConfig(), MatchConfig())
    assert not bool(jnp.any(res.accept))
    assert not bool(jnp.any(jnp.isnan(res.z)))


def test_accept_budget_keeps_top_scores():
    """max_accept_per_query: with many verifiable candidates only the
    highest-score K become factors (loop-factor sparsity on revisits)."""
    import dataclasses

    world = synth.box_world(half=10.0)
    kf, poses, angles = _store_along_line(world)
    query_pose = jnp.asarray(poses[1], jnp.float32)
    r = synth.simulate_scans(world, query_pose[None], angles, 15.0, 0.005,
                             jax.random.PRNGKey(99))[0]
    qpts, qmsk = synth.polar_to_xy(r, angles, 0.1, 15.0)

    unbudgeted = dataclasses.replace(LOOP, max_accept_per_query=0)
    budget1 = dataclasses.replace(LOOP, max_accept_per_query=1)
    res_all = closure.detect_loops(kf, qpts, qmsk, query_pose,
                                   jnp.asarray(8, jnp.int32), unbudgeted,
                                   NDTMapConfig(), MatchConfig())
    res_one = closure.detect_loops(kf, qpts, qmsk, query_pose,
                                   jnp.asarray(8, jnp.int32), budget1,
                                   NDTMapConfig(), MatchConfig())
    n_all = int(jnp.sum(res_all.accept))
    n_one = int(jnp.sum(res_one.accept))
    assert n_all >= 2, n_all            # several candidates verify here
    assert n_one == 1, n_one
    # The survivor is the best-scoring accepted candidate.
    best = float(jnp.max(jnp.where(res_all.accept, res_all.score, -jnp.inf)))
    kept = float(jnp.max(jnp.where(res_one.accept, res_one.score, -jnp.inf)))
    assert abs(kept - best) < 1e-6, (kept, best)
