"""Multi-session merging: global alignment recovers a known inter-session
transform; merged graph/map are consistent (config 5 capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndtpu.config import (GridConfig, MatchConfig, NDTMapConfig, SolverConfig)
from ndtpu.data import synth
from ndtpu.graph import factors as fct
from ndtpu.graph import solve as slv
from ndtpu.lie import se2
from ndtpu.ndt import grid as ndt_grid
from ndtpu.slam import keyframes as kfs
from ndtpu.slam import merge

GRID = GridConfig(x0=-12.0, y0=-12.0, cell=1.0, nx=24, ny=24, overlap=4)


def _session_map():
    world = synth.box_world(half=10.0)
    angles = synth.beam_angles(180)
    poses = synth.rectangle_trajectory(24, half=6.0, step=1.0,
                                       dtype=jnp.float32)
    ranges = synth.simulate_scans(world, poses, angles, 18.0, 0.005,
                                  jax.random.PRNGKey(0))
    pts, msk = synth.polar_to_xy(ranges, angles, 0.1, 18.0)
    wpts = se2.transform(poses, pts)
    stats = ndt_grid.build_stats(wpts.reshape(-1, 2), msk.reshape(-1), GRID)
    return world, angles, ndt_grid.finalize(stats, NDTMapConfig())


def test_global_align_recovers_transform():
    world, angles, map_a = _session_map()
    # Session B's base frame is offset by a known transform in A's frame.
    t_true = jnp.asarray([2.5, -1.5, 0.8], jnp.float32)
    r = synth.simulate_scans(world, t_true[None], angles, 18.0, 0.005,
                             jax.random.PRNGKey(7))[0]
    pts, msk = synth.polar_to_xy(r, angles, 0.1, 18.0)

    res = merge.global_align(map_a, GRID, pts, msk, span=4.0, step=1.0,
                             n_theta=16)
    assert bool(res.converged)
    err = np.abs(np.asarray(se2.between(res.transform, t_true)))
    assert err[0] < 0.15 and err[1] < 0.15 and err[2] < 0.1, (
        np.asarray(res.transform), np.asarray(t_true))


def test_merge_graphs_and_optimize():
    dt = jnp.float64
    sq = jnp.asarray(np.diag([10.0, 10.0, 20.0]), dt)

    def chain(start, n, cap):
        g = fct.empty_graph(cap, 2, 2 * cap, dt)
        pose = jnp.asarray(start, dt)
        g = fct.add_pose(g, pose)
        for _ in range(n - 1):
            nxt = se2.compose(pose, jnp.asarray([1.0, 0.0, 0.1], dt))
            g = fct.add_between(g, g.n_poses - 1, g.n_poses,
                                jnp.asarray([1.0, 0.0, 0.1], dt), sq)
            g = fct.add_pose(g, nxt)
            pose = nxt
        return g

    ga = chain([0.0, 0.0, 0.0], 6, 8)
    ga = fct.add_prior(ga, 0, jnp.zeros(3, dt), sq)
    gb = chain([0.0, 0.0, 0.0], 5, 8)   # in B's own frame

    t_ab = jnp.asarray([3.0, 1.0, 0.5], dt)
    # Inter-session factor tying A pose 0 to B pose 0 at exactly t_ab.
    inter = (np.asarray([0]), np.asarray([0]), t_ab[None, :], sq[None])
    g = merge.merge_graphs(ga, gb, t_ab, inter_factors=inter)

    assert int(g.pose_mask.sum()) == 11  # live poses across both sessions
    assert int(g.n_poses) == 8 + 5       # append cursor past B's region
    # B pose 0 landed at t_ab.
    na = 8  # capacity offset of session A
    np.testing.assert_allclose(np.asarray(g.poses[na]), np.asarray(t_ab),
                               atol=1e-6)
    # Joint solve stays at the consistent optimum.
    out = slv.optimize(g, SolverConfig(max_iter=20), method="dense")
    assert float(out.chi2) < 1e-10


def test_merged_map_stats_counts_add():
    n_beams = 16
    kf_a = kfs.empty_store(2, n_beams, jnp.float32)
    kf_b = kfs.empty_store(2, n_beams, jnp.float32)
    pts = jnp.zeros((n_beams, 2), jnp.float32) + jnp.asarray([0.5, 0.5])
    m = jnp.ones((n_beams,), bool)
    kf_a = kfs.add_keyframe(kf_a, jnp.zeros(3), pts, m)
    kf_b = kfs.add_keyframe(kf_b, jnp.zeros(3), pts, m)
    t_ab = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    stats = merge.merged_map_stats(kf_a, kf_b, t_ab, GRID)
    # All 32 points land somewhere; total mass preserved.
    assert float(stats.n.sum()) == 32 * GRID.overlap
