"""Stacked multi-session serving (ndtpu.dist.slam_dp, VERDICT r5 task 1).

Covers the serving-specific machinery: the block-diagonal flat graph, the
per-lane quad-table matcher, the batch-hoisted smoother's invariants, the
hazard guard, and an end-to-end stacked-vs-single comparison.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndtpu.config import (GridConfig, KeyframeConfig, LoopConfig,
                          MatchConfig, NDTMapConfig, PipelineConfig,
                          SolverConfig)
from ndtpu.data import synth
from ndtpu.dist import slam_dp
from ndtpu.eval.ate import ate_rmse
from ndtpu.graph import factors as fct
from ndtpu.lie import se2
from ndtpu.ndt import grid as ndt_grid
from ndtpu.slam import pipeline


def _session_cfg(**over):
    base = dict(
        grid=GridConfig(x0=-14.0, y0=-14.0, cell=0.5, nx=56, ny=56,
                        overlap=4),
        keyframe=KeyframeConfig(dist_thresh=0.5, angle_thresh=0.3,
                                capacity=256),
        loop=LoopConfig(radius=3.0, min_index_gap=10, max_candidates=4,
                        local_half_extent=8.0),
        solver=SolverConfig(inc_iters=2, pcg_max_iter=40),
        n_beams=180, max_range=20.0, window=8, window_passes=2,
        use_loop_closure=True,
    )
    base.update(over)
    return PipelineConfig(**base)


def _chain_graph(key, n, cap=32):
    """Small noisy pose chain with a prior, as one session graph."""
    g = fct.empty_graph(cap, 2, 2 * cap, jnp.float64)
    pose = jnp.zeros(3, jnp.float64)
    g = fct.add_pose(g, pose)
    g = fct.add_prior(g, 0, pose, jnp.eye(3, dtype=jnp.float64) * 10)
    step = jnp.asarray([1.0, 0.0, 0.1], jnp.float64)
    for i in range(1, n):
        noise = 0.05 * jax.random.normal(jax.random.fold_in(key, i), (3,),
                                         jnp.float64)
        pose = se2.compose(pose, step + noise)
        g = fct.add_pose(g, pose)
        g = fct.add_between(g, i - 1, i, step,
                            jnp.eye(3, dtype=jnp.float64) * 5)
    return g


def _stack(graphs):
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *graphs)


def test_flat_graph_chi2_exact():
    """chi2 of the block-diagonal flat graph == sum of per-session chi2."""
    g0 = _chain_graph(jax.random.PRNGKey(0), 12)
    g1 = _chain_graph(jax.random.PRNGKey(1), 9)
    flat = slam_dp._flat_graph(_stack([g0, g1]))
    chi_flat = float(fct.chi2(flat))
    chi_sum = float(fct.chi2(g0)) + float(fct.chi2(g1))
    assert abs(chi_flat - chi_sum) < 1e-9 * max(1.0, abs(chi_sum))


def test_lookup_quad_multi_matches_per_lane():
    """Per-lane table gather == looping lookup_quad over lanes (exact)."""
    grid = GridConfig(x0=-4.0, y0=-4.0, cell=1.0, nx=8, ny=8, overlap=4)
    key = jax.random.PRNGKey(3)
    b, n = 3, 50
    wh, hh = ndt_grid._quad_lattice(grid)
    tables = jax.random.normal(key, (b, wh * hh, 32), jnp.float64)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (b, n),
                           jnp.float64, -6.0, 6.0)
    y = jax.random.uniform(jax.random.fold_in(key, 2), (b, n),
                           jnp.float64, -6.0, 6.0)
    rows, inb = ndt_grid.lookup_quad_multi(tables, x, y, grid)
    for i in range(b):
        r1, i1 = ndt_grid.lookup_quad(tables[i], x[i], y[i], grid)
        np.testing.assert_array_equal(np.asarray(rows[i]), np.asarray(r1))
        np.testing.assert_array_equal(np.asarray(inb[i]), np.asarray(i1))


def test_smooth_stacked_invariants():
    """The flat stacked smoother reduces chi2 for active sessions and
    leaves any_kf=False sessions bit-untouched."""
    g0 = _chain_graph(jax.random.PRNGKey(10), 14)
    g1 = _chain_graph(jax.random.PRNGKey(11), 14)
    graph8 = _stack([g0, g1])
    cfg = _session_cfg()
    # _smooth_stacked only reads sm_lam / sm_last_delta / sm_step; the
    # other SlamState fields are inert placeholders here.
    state8 = pipeline.SlamState(
        stats=jnp.zeros((2,)), kf=jnp.zeros((2,)), graph=jnp.zeros((2,)),
        sm_lam=jnp.full((2,), 1e-4, jnp.float64),
        sm_last_delta=jnp.full((2,), jnp.inf, jnp.float64),
        sm_step=jnp.zeros((2,), jnp.int32),
        pose=jnp.zeros((2, 3)), last_kf_idx=jnp.zeros((2,), jnp.int32),
        n_loops=jnp.zeros((2,), jnp.int32),
        map_kf_poses=jnp.zeros((2, 1, 3)))
    any_kf = jnp.asarray([True, False])
    need = any_kf  # session 0 needs an update; session 1 is idle
    sm, take = slam_dp._smooth_stacked(state8, graph8, any_kf, need, cfg)
    chi0_before = float(fct.chi2(g0))
    chi0_after = float(fct.chi2(
        g0._replace(poses=sm.graph.poses[0])))
    assert chi0_after < chi0_before
    # inactive session: poses bit-identical, lam/step untouched
    np.testing.assert_array_equal(np.asarray(sm.graph.poses[1]),
                                  np.asarray(g1.poses))
    assert int(sm.step[1]) == 0 and int(sm.step[0]) == 1
    assert int(take[0]) == 1 and int(take[1]) == 0
    # keyframed-but-settled session (any_kf=True, need=False): poses
    # untouched (the SKIP semantics), step advances, last_max_delta -> 0.
    sm2, take2 = slam_dp._smooth_stacked(
        state8, graph8, jnp.asarray([True, True]),
        jnp.asarray([True, False]), cfg)
    np.testing.assert_array_equal(np.asarray(sm2.graph.poses[1]),
                                  np.asarray(g1.poses))
    assert int(take2[1]) == 0 and int(sm2.step[1]) == 1
    assert float(sm2.last_max_delta[1]) == 0.0


def test_hazard_guard_and_serving_config():
    cfg = _session_cfg()
    assert slam_dp.vmap_cond_hazards(cfg)          # legacy cfg has hazards
    scfg = slam_dp.serving_config(cfg)
    assert slam_dp.vmap_cond_hazards(scfg) == []
    pts = jnp.zeros((2, 9, 4, 2))
    msk = jnp.zeros((2, 9, 4), bool)
    odo = jnp.zeros((2, 9, 3))
    with pytest.raises(ValueError):
        slam_dp.run_sessions_stacked(pts, msk, odo, cfg)


def test_stacked_end_to_end_matches_single():
    """Two short sessions through the stacked runner: per-session ATE in
    family with the single-session windowed pipeline under the same
    serving config (the smoothers differ only in dispatch structure —
    joint-Krylov PCG vs per-session PCG — so a small tolerance is
    expected, not bit-parity)."""
    cfg = slam_dp.serving_config(_session_cfg())
    world = synth.box_world(half=11.0)
    seqs = []
    for k in range(2):
        traj = synth.rectangle_trajectory(90, half=6.0 + 0.3 * k, step=0.2)
        seqs.append(synth.make_sequence(world, traj, n_beams=180,
                                        max_range=20.0, min_range=0.1,
                                        seed=40 + k, odom_trans_std=0.04,
                                        odom_rot_std=0.01))
    P = jnp.stack([s.points for s in seqs])
    M = jnp.stack([s.mask for s in seqs])
    O = jnp.stack([s.odom for s in seqs])
    st, outs = jax.jit(
        lambda p, m, o: slam_dp.run_sessions_stacked(p, m, o, cfg))(P, M, O)
    for k in range(2):
        stk = jax.tree_util.tree_map(lambda a: a[k], st)
        ok = jax.tree_util.tree_map(lambda a: a[k], outs)
        ate_st = float(ate_rmse(pipeline.recover_trajectory(stk, ok),
                                seqs[k].gt_poses))
        st1, o1 = jax.jit(lambda p, m, o: pipeline.run_slam_windowed(
            p, m, o, cfg))(seqs[k].points, seqs[k].mask, seqs[k].odom)
        ate_1 = float(ate_rmse(pipeline.recover_trajectory(st1, o1),
                               seqs[k].gt_poses))
        assert ate_st < 0.15, (k, ate_st)
        assert abs(ate_st - ate_1) < 0.1, (k, ate_st, ate_1)


def test_lookup_quad_grouped_matches_per_lane():
    """Grouped lookup (lane -> shared session table) must agree with the
    per-lane multi lookup when each lane's table is its group's table."""
    rng = np.random.default_rng(3)
    grid = GridConfig(x0=-4.0, y0=-4.0, cell=0.5, nx=16, ny=16, overlap=4)
    from ndtpu.ndt.grid import (_quad_lattice, lookup_quad_grouped,
                                lookup_quad_multi)
    s, b, n = 3, 6, 32
    wh, hh = _quad_lattice(grid)
    r = wh * hh
    tables = jnp.asarray(rng.normal(0, 1, (s, r, 16)), jnp.float32)
    group = jnp.asarray(rng.integers(0, s, b), jnp.int32)
    x = jnp.asarray(rng.uniform(-5, 5, (b, n)), jnp.float32)
    y = jnp.asarray(rng.uniform(-5, 5, (b, n)), jnp.float32)
    rows_g, inb_g = lookup_quad_grouped(tables.reshape(s * r, 16), r, group,
                                        x, y, grid)
    rows_m, inb_m = lookup_quad_multi(tables[group], x, y, grid)
    np.testing.assert_array_equal(np.asarray(inb_g), np.asarray(inb_m))
    np.testing.assert_array_equal(np.asarray(rows_g), np.asarray(rows_m))


def test_match_grouped_matches_per_session():
    """match_batch_packed with group= must reproduce per-session
    match_batch_packed against each session's own table (same lanes, same
    LM trajectory — bit-identical results)."""
    from ndtpu.ndt import match as ndt_match

    rng = np.random.default_rng(5)
    grid = GridConfig(x0=-10.0, y0=-10.0, cell=0.5, nx=40, ny=40, overlap=4)
    mcfg, ncfg = MatchConfig(), NDTMapConfig()
    world = synth.box_world(half=8.0)
    s, w = 2, 4
    tables, ptss, msks, inits = [], [], [], []
    for k in range(s):
        traj = synth.rectangle_trajectory(12, half=5.0 + 0.4 * k, step=0.3)
        sq = synth.make_sequence(world, traj, n_beams=120, max_range=20.0,
                                 min_range=0.1, seed=60 + k)
        wp = se2.transform(sq.gt_poses, sq.points)
        stats = ndt_grid.build_stats(wp.reshape(-1, 2), sq.mask.reshape(-1),
                                     grid)
        tables.append(ndt_grid.pack_quad(ndt_grid.finalize(stats, ncfg),
                                         grid, compact=mcfg.compact_table))
        ptss.append(sq.points[:w])
        msks.append(sq.mask[:w])
        inits.append(sq.gt_poses[:w] + 0.05)
    T = jnp.stack(tables)
    group = jnp.repeat(jnp.arange(s, dtype=jnp.int32), w)
    res_g = ndt_match.match_batch_packed(
        jnp.concatenate(ptss), jnp.concatenate(msks), T,
        jnp.concatenate(inits), grid, mcfg, group=group)
    for k in range(s):
        res_k = ndt_match.match_batch_packed(ptss[k], msks[k], tables[k],
                                             inits[k], grid, mcfg)
        np.testing.assert_allclose(
            np.asarray(res_g.pose[k * w:(k + 1) * w]),
            np.asarray(res_k.pose), atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(res_g.converged[k * w:(k + 1) * w]),
            np.asarray(res_k.converged))


def test_add_points_weight_array():
    """Per-point weight arrays: concat(subtract-old, add-new) in one call
    must equal the two-call subtract + add path (same sums, one pooling
    pass) for both overlap=4 and overlap=1 grids."""
    rng = np.random.default_rng(7)
    for overlap in (4, 1):
        grid = GridConfig(x0=-4.0, y0=-4.0, cell=0.5, nx=16, ny=16,
                          overlap=overlap)
        base = jnp.asarray(rng.uniform(-3, 3, (64, 2)), jnp.float32)
        old = jnp.asarray(rng.uniform(-3, 3, (32, 2)), jnp.float32)
        new = old + 0.2
        msk_b = jnp.asarray(rng.random(64) < 0.9)
        msk_o = jnp.asarray(rng.random(32) < 0.9)
        stats0 = ndt_grid.add_points(
            ndt_grid.empty_stats(grid, jnp.float32), base, msk_b, grid)
        two = ndt_grid.add_points(stats0, old, msk_o, grid, weight=-1.0)
        two = ndt_grid.add_points(two, new, msk_o, grid)
        both = jnp.concatenate([old, new])
        wts = jnp.concatenate([jnp.full((32,), -1.0, jnp.float32),
                               jnp.ones((32,), jnp.float32)])
        one = ndt_grid.add_points(stats0, both,
                                  jnp.concatenate([msk_o, msk_o]), grid,
                                  weight=wts)
        for a, b in zip(one, two):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def test_frontend_stacked_matches_vmapped():
    """The fused flat frontend must agree with a vmap of the per-session
    _window_frontend (same lanes, same tables; the flat program only
    changes dispatch structure, so poses should agree to f32 tolerance)."""
    cfg = slam_dp.serving_config(_session_cfg())
    world = synth.box_world(half=11.0)
    seqs = []
    for k in range(2):
        traj = synth.rectangle_trajectory(10, half=6.0 + 0.3 * k, step=0.2)
        seqs.append(synth.make_sequence(world, traj, n_beams=180,
                                        max_range=20.0, min_range=0.1,
                                        seed=80 + k, odom_trans_std=0.04,
                                        odom_rot_std=0.01))
    P = jnp.stack([s.points for s in seqs])
    M = jnp.stack([s.mask for s in seqs])
    O = jnp.stack([s.odom for s in seqs])
    state8 = jax.vmap(lambda p, m: pipeline.init_slam(cfg, p, m))(
        P[:, 0], M[:, 0])
    poses_f, res_f, kf_f = slam_dp._frontend_stacked(
        state8, state8.pose, P[:, 1:], M[:, 1:], O[:, 1:], cfg)
    poses_v, res_v, kf_v = jax.vmap(
        lambda st, lk, p, m, d: pipeline._window_frontend(
            st, lk, p, m, d, cfg, cfg.window_passes)
    )(state8, state8.pose, P[:, 1:], M[:, 1:], O[:, 1:])
    np.testing.assert_allclose(np.asarray(poses_f), np.asarray(poses_v),
                               atol=5e-3)
    np.testing.assert_array_equal(np.asarray(kf_f), np.asarray(kf_v))
