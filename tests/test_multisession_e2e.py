"""Config-5 end-to-end: two SLAM sessions with unknown relative transform
→ global alignment → graph+map fusion → joint optimization."""

import jax.numpy as jnp
import numpy as np
import pytest

from ndtpu.config import (GridConfig, KeyframeConfig, LoopConfig, MatchConfig,
                          NDTMapConfig, PipelineConfig, SolverConfig)
from ndtpu.data import synth
from ndtpu.graph import factors as fct
from ndtpu.graph import solve as slv
from ndtpu.lie import se2
from ndtpu.ndt import grid as ndt_grid
from ndtpu.slam import merge, pipeline


def _cfg():
    return PipelineConfig(
        grid=GridConfig(x0=-12.0, y0=-12.0, cell=1.0, nx=24, ny=24,
                        overlap=4),
        keyframe=KeyframeConfig(dist_thresh=0.7, angle_thresh=0.35,
                                capacity=48),
        loop=LoopConfig(radius=3.0, min_index_gap=8, max_candidates=4,
                        local_half_extent=8.0),
        solver=SolverConfig(inc_iters=1, pcg_max_iter=40),
        use_loop_closure=False,
    )


def test_two_session_merge_end_to_end():
    cfg = _cfg()
    world = synth.box_world(half=9.0)

    # Session A: larger rectangle mapping most of the room. Session B: an
    # offset smaller loop. Each session's SLAM anchors its own frame at its
    # first scan, so the ground-truth inter-session transform is B's first
    # world pose.
    traj_a = synth.rectangle_trajectory(60, half=6.0, step=0.3)
    b0 = jnp.asarray([1.5, 2.0, 0.7], jnp.float32)
    traj_b_world = se2.compose(
        jnp.broadcast_to(b0, (40, 3)),
        synth.rectangle_trajectory(40, half=4.0, step=0.25))
    # Both sessions anchor their internal frame at their own first scan, so
    # the B-frame -> A-frame transform is the relative first-scan pose.
    t_expected = se2.between(traj_a[0], traj_b_world[0])

    seq_a = synth.make_sequence(world, traj_a, n_beams=180, max_range=16.0,
                                min_range=0.1, seed=5)
    seq_b = synth.make_sequence(world, traj_b_world, n_beams=180,
                                max_range=16.0, min_range=0.1, seed=6)

    sa, _ = pipeline.run_slam(seq_a.points, seq_a.mask, seq_a.odom, cfg)
    sb, _ = pipeline.run_slam(seq_b.points, seq_b.mask, seq_b.odom, cfg)

    # Align session B's base frame into A's map using B's first keyframe scan.
    map_a = ndt_grid.finalize(sa.stats, cfg.ndt)
    # span must cover the true offset (|t_expected| ~ 7.4 m): with span=6
    # the nearest hypothesis is >1 m away and success depends on coarse-LM
    # drift winning a tie against the room's near-pi-symmetric alias.
    res = merge.global_align(map_a, cfg.grid, sb.kf.points[0],
                             sb.kf.masks[0], span=8.0, step=1.0, n_theta=16)
    assert bool(res.converged)
    err = np.abs(np.asarray(se2.between(res.transform, t_expected)))
    assert err[0] < 0.3 and err[1] < 0.3 and err[2] < 0.15, (
        np.asarray(res.transform), np.asarray(t_expected))

    # Fuse graphs with the estimated transform as an inter-session factor.
    sq = jnp.asarray(np.diag([10.0, 10.0, 20.0]), jnp.float32)
    inter = (np.asarray([0]), np.asarray([0]), res.transform[None, :],
             sq[None])
    g = merge.merge_graphs(sa.graph, sb.graph, res.transform,
                           inter_factors=inter)
    out = slv.optimize(g, SolverConfig(max_iter=15), method="pcg")
    assert float(out.chi2) < float(fct.chi2(g)) + 1e-6

    # Fused map: keyframes of both sessions present, mass adds up.
    stats = merge.merged_map_stats(sa.kf, sb.kf, res.transform, cfg.grid)
    na = float(jnp.sum(sa.kf.masks & sa.kf.live[:, None]))
    nb = float(jnp.sum(sb.kf.masks & sb.kf.live[:, None]))
    assert float(stats.n.sum()) <= (na + nb) * cfg.grid.overlap
    # Not all points land on-grid (the A-anchored frame shifts the room
    # partly outside the 24 m map window); half is a safe plumbing check.
    assert float(stats.n.sum()) >= 0.5 * (na + nb) * cfg.grid.overlap


def test_auto_inter_session_loops_beat_anchor_only():
    """VERDICT r5 task 2: automatically-generated inter-session loop
    factors correct a misaligned merge that a single anchor factor cannot.

    The merge transform is deliberately perturbed from the aligned one.
    The anchor factor's measurement IS the (wrong) transform, so
    anchor-only optimization keeps session B misplaced; the auto factors
    are independent NDT measurements of B scans against A keyframes'
    cached local maps, so they pull B back to its true placement."""
    cfg = _cfg()
    world = synth.box_world(half=9.0)
    traj_a = synth.rectangle_trajectory(60, half=6.0, step=0.3)
    b0 = jnp.asarray([1.5, 2.0, 0.7], jnp.float32)
    traj_b_world = se2.compose(
        jnp.broadcast_to(b0, (40, 3)),
        synth.rectangle_trajectory(40, half=4.0, step=0.25))
    t_expected = se2.between(traj_a[0], traj_b_world[0])
    seq_a = synth.make_sequence(world, traj_a, n_beams=180, max_range=16.0,
                                min_range=0.1, seed=5)
    seq_b = synth.make_sequence(world, traj_b_world, n_beams=180,
                                max_range=16.0, min_range=0.1, seed=6)
    sa, _ = pipeline.run_slam_windowed(seq_a.points, seq_a.mask, seq_a.odom,
                                       cfg)
    sb, _ = pipeline.run_slam_windowed(seq_b.points, seq_b.mask, seq_b.odom,
                                       cfg)
    map_a = ndt_grid.finalize(sa.stats, cfg.ndt)
    res = merge.global_align(map_a, cfg.grid, sb.kf.points[0], sb.kf.masks[0],
                             span=8.0, step=1.0, n_theta=16)
    assert bool(res.converged)

    # Perturbed merge transform: the error the inter factors must fix.
    t_bad = se2.compose(res.transform,
                        jnp.asarray([0.25, -0.2, 0.06], jnp.float32))

    def b_placement_err(graph):
        na = sa.graph.capacity
        live = np.asarray(sb.kf.live)
        idx = np.flatnonzero(live)
        merged_b = np.asarray(graph.poses)[na + idx]
        true_b = np.asarray(se2.compose(
            jnp.broadcast_to(t_expected, (idx.size, 3)),
            sb.graph.poses[idx]))
        d = merged_b[:, :2] - true_b[:, :2]
        return float(np.hypot(d[:, 0], d[:, 1]).mean())

    sq = jnp.asarray(np.diag([10.0, 10.0, 20.0]), jnp.float32)
    anchor = (np.asarray([0]), np.asarray([0]), t_bad[None, :], sq[None])
    g_anchor = merge.merge_graphs(sa.graph, sb.graph, t_bad,
                                  inter_factors=anchor)
    out_anchor = slv.optimize(g_anchor, SolverConfig(max_iter=15),
                              method="pcg")

    i_a, j_b, z, sqi = merge.find_inter_session_loops(
        sa.kf, sb.kf, t_bad, cfg.loop, cfg.match, ndt_cfg=cfg.ndt)
    assert i_a.size >= 4, f"only {i_a.size} inter-session loops accepted"
    g_auto = merge.merge_graphs(sa.graph, sb.graph, t_bad,
                                inter_factors=(i_a, j_b, z, sqi))
    out_auto = slv.optimize(g_auto, SolverConfig(max_iter=15), method="pcg")

    err_anchor = b_placement_err(out_anchor.graph)
    err_auto = b_placement_err(out_auto.graph)
    # Anchor-only keeps (roughly) the injected ~0.32 m offset; the auto
    # factors should recover most of it.
    assert err_auto < 0.6 * err_anchor, (err_anchor, err_auto)
    assert err_auto < 0.15, err_auto


def test_merged_graph_solves_across_two_processes(tmp_path):
    """The full config-5 story: two windowed SLAM sessions -> global
    alignment -> fused graph -> DISTRIBUTED Schur solve across 2 real OS
    processes over jax.distributed."""
    from ndtpu.dist.launch import launch_local, save_graph_npz

    cfg = _cfg()
    world = synth.box_world(half=9.0)
    traj_a = synth.rectangle_trajectory(49, half=6.0, step=0.3)
    b0 = jnp.asarray([1.5, 2.0, 0.7], jnp.float32)
    traj_b = se2.compose(jnp.broadcast_to(b0, (33, 3)),
                         synth.rectangle_trajectory(33, half=4.0, step=0.25))
    seq_a = synth.make_sequence(world, traj_a, n_beams=180, max_range=16.0,
                                min_range=0.1, seed=5)
    seq_b = synth.make_sequence(world, traj_b, n_beams=180, max_range=16.0,
                                min_range=0.1, seed=6)
    sa, _ = pipeline.run_slam_windowed(seq_a.points, seq_a.mask, seq_a.odom,
                                       cfg)
    sb, _ = pipeline.run_slam_windowed(seq_b.points, seq_b.mask, seq_b.odom,
                                       cfg)
    map_a = ndt_grid.finalize(sa.stats, cfg.ndt)
    res = merge.global_align(map_a, cfg.grid, sb.kf.points[0], sb.kf.masks[0],
                             span=8.0, step=1.0, n_theta=16)
    assert bool(res.converged)
    sq = jnp.asarray(np.diag([10.0, 10.0, 20.0]), jnp.float32)
    inter = (np.asarray([0]), np.asarray([0]), res.transform[None, :],
             sq[None])
    g = merge.merge_graphs(sa.graph, sb.graph, res.transform,
                           inter_factors=inter)

    path = str(tmp_path / "merged_graph.npz")
    save_graph_npz(path, g)
    rec = launch_local(2, graph_npz=path, port=29531)
    assert rec["num_processes"] == 2
    assert rec["chi2_after"] <= rec["chi2_before"] + 1e-6, rec
    # The merged problem is solvable: chi2 lands at a small value.
    assert rec["chi2_after"] < max(0.5 * rec["chi2_before"], 50.0), rec
