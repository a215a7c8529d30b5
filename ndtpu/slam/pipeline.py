"""Full SLAM pipeline: NDT odometry + keyframing + loop closure + smoothing.

Capability parity (SURVEY.md §4.1 "Main SLAM loop", BASELINE configs 2-3):
per scan — predict from odometry, register against the online NDT map, spawn
keyframes, detect/verify loop closures among keyframes, maintain the pose
graph with incremental smoothing, and rebuild the map after topology-changing
corrections.

TPU-first design: the whole sequence is ONE ``lax.scan``; every
data-dependent event (keyframe spawn, loop acceptance, map rebuild) is a
``lax.cond`` branch or masked write inside the step, so a T-scan run is a
single XLA program with one host->device transfer in and one out. The
reference interleaves all of this on the host per scan (SURVEY.md §4.1).

Keyframe store index == pose-graph variable index (1:1), which makes the
pose sync after smoothing a single array copy.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndtpu.config import PipelineConfig
from ndtpu.graph import factors as fct
from ndtpu.graph import incremental as inc
from ndtpu.lie import se2
from ndtpu.loop import closure
from ndtpu.ndt import grid as ndt_grid
from ndtpu.ndt import match as ndt_match
from ndtpu.slam import keyframes as kfs

__all__ = ["SlamState", "SlamStepOut", "init_slam", "slam_step", "run_slam",
           "recover_trajectory"]


class SlamState(NamedTuple):
    stats: ndt_grid.NDTStats   # online NDT map sufficient statistics
    kf: kfs.KeyframeStore      # keyframe scans + poses (index == graph index)
    graph: fct.PoseGraph       # pose graph over keyframes
    sm_lam: jax.Array          # [] smoother damping
    sm_last_delta: jax.Array   # [] smoother last max step
    pose: jax.Array            # [3] current pose estimate
    last_kf_idx: jax.Array     # [] int32 graph index of the latest keyframe
    n_loops: jax.Array         # [] int32 accepted loop closures so far


class SlamStepOut(NamedTuple):
    pose: jax.Array        # [3] per-scan pose estimate (at processing time)
    kf_idx: jax.Array      # [] int32 keyframe this scan hangs off
    rel: jax.Array         # [3] pose relative to that keyframe
    score: jax.Array       # [] NDT match quality
    is_keyframe: jax.Array  # [] bool
    n_loops_new: jax.Array  # [] int32 loops accepted at this step


def init_slam(cfg: PipelineConfig, first_points, first_mask,
              init_pose=None) -> SlamState:
    """Bootstrap: scan 0 becomes keyframe 0 / graph pose 0 with a prior."""
    dt = first_points.dtype
    t0 = jnp.zeros((3,), dt) if init_pose is None else init_pose.astype(dt)
    cap = cfg.keyframe.capacity

    stats = ndt_grid.add_points(
        ndt_grid.empty_stats(cfg.grid, dt),
        se2.transform(t0, first_points), first_mask, cfg.grid)

    kf = kfs.add_keyframe(
        kfs.empty_store(cap, first_points.shape[0], dt),
        t0, first_points, first_mask)

    graph = fct.empty_graph(cap, 4, 2 * cap, dt)
    graph = fct.add_pose(graph, t0)
    prior_sq = jnp.asarray(
        [[100.0, 0, 0], [0, 100.0, 0], [0, 0, 100.0]], dt)
    graph = fct.add_prior(graph, 0, t0, prior_sq)

    return SlamState(
        stats=stats, kf=kf, graph=graph,
        sm_lam=jnp.asarray(cfg.solver.init_lambda, dt),
        sm_last_delta=jnp.asarray(jnp.inf, dt),
        pose=t0, last_kf_idx=jnp.asarray(0, jnp.int32),
        n_loops=jnp.asarray(0, jnp.int32),
    )


def _odom_info_sqrt(hessian, dt):
    """Between-factor sqrt information from the registration Hessian."""
    h = 0.5 * (hessian + hessian.T) + 1e-3 * jnp.eye(3, dtype=dt)
    return fct.info_to_sqrt_info(h)


def _keyframe_branch(state: SlamState, pts, msk, pose, hessian,
                     cfg: PipelineConfig):
    """Everything that happens when a scan is promoted to a keyframe."""
    dt = pose.dtype
    new_idx = state.graph.n_poses
    last_idx = state.last_kf_idx

    # 1. new pose variable + odometry between factor (noise from H).
    graph = fct.add_pose(state.graph, pose)
    z_odo = se2.between(state.graph.poses[last_idx], pose)
    graph = fct.add_between(graph, last_idx, new_idx, z_odo,
                            _odom_info_sqrt(hessian, dt))

    # 2. keyframe store append (before detection: the query is NOT a
    #    candidate for itself thanks to the index-gap test).
    kf = kfs.add_keyframe(state.kf, pose, pts, msk)

    # 3. batched loop detection + masked factor appends.
    if cfg.use_loop_closure:
        loops = closure.detect_loops(
            kf, pts, msk, pose, new_idx, cfg.loop, cfg.ndt, cfg.match)

        def append(i, g):
            return fct.add_between(g, loops.j[i], new_idx, loops.z[i],
                                   loops.sqrt_info[i], enabled=loops.accept[i])

        graph = jax.lax.fori_loop(0, cfg.loop.max_candidates, append, graph)
        n_new = jnp.sum(loops.accept, dtype=jnp.int32)
    else:
        n_new = jnp.asarray(0, jnp.int32)

    # 4. incremental smoothing (iSAM2-update role).
    sm = inc.SmootherState(graph=graph, lam=state.sm_lam,
                           last_max_delta=state.sm_last_delta,
                           step=jnp.asarray(0, jnp.int32))
    sm = inc.incremental_update(sm, cfg.solver)
    graph = sm.graph

    # 5. sync keyframe poses from the graph; current pose = newest estimate.
    kf = kf._replace(poses=graph.poses[: kf.capacity])
    pose_out = graph.poses[new_idx]

    # 6. map maintenance: loop accepted -> rebuild from all keyframes at
    #    corrected poses (one batched segment_sum); else just add this scan.
    def rebuild(_):
        world = se2.transform(kf.poses, kf.points)       # [K, N, 2]
        m = kf.masks & kf.live[:, None]
        return ndt_grid.build_stats(world.reshape(-1, 2), m.reshape(-1),
                                    cfg.grid)

    def extend(_):
        return ndt_grid.add_points(state.stats, se2.transform(pose_out, pts),
                                   msk, cfg.grid)

    stats = jax.lax.cond(n_new > 0, rebuild, extend, None)

    return SlamState(
        stats=stats, kf=kf, graph=graph, sm_lam=sm.lam,
        sm_last_delta=sm.last_max_delta, pose=pose_out,
        last_kf_idx=new_idx, n_loops=state.n_loops + n_new,
    ), n_new


def slam_step(state: SlamState, pts, msk, odom_delta,
              cfg: PipelineConfig):
    """Process one scan; returns ``(new_state, SlamStepOut)``. Jittable."""
    init = se2.compose(state.pose, odom_delta)
    ndt_map = ndt_grid.finalize(state.stats, cfg.ndt)
    res = ndt_match.match(pts, msk, ndt_map, init, cfg.grid, cfg.match)
    # Fall back to the odometry prediction if registration failed outright.
    pose = jnp.where(res.converged, res.pose, init)

    last_kf_pose = state.graph.poses[state.last_kf_idx]
    diff = se2.between(last_kf_pose, pose)
    is_kf = ((jnp.linalg.norm(diff[:2]) > cfg.keyframe.dist_thresh)
             | (jnp.abs(diff[2]) > cfg.keyframe.angle_thresh))

    def kf_branch(st):
        return _keyframe_branch(st, pts, msk, pose, res.hessian, cfg)

    def no_kf(st):
        return st._replace(pose=pose), jnp.asarray(0, jnp.int32)

    new_state, n_new = jax.lax.cond(is_kf, kf_branch, no_kf, state)

    out = SlamStepOut(
        pose=new_state.pose,
        kf_idx=new_state.last_kf_idx,
        rel=se2.between(new_state.graph.poses[new_state.last_kf_idx],
                        new_state.pose),
        score=res.score,
        is_keyframe=is_kf,
        n_loops_new=n_new,
    )
    return new_state, out


#: Jit-compiled :func:`slam_step` (``cfg`` static). Use this for host-driven
#: per-scan loops — checkpoint/resume drivers, online serving — where calling
#: the un-jitted step would re-trace the whole graph every scan.
slam_step_jit = jax.jit(slam_step, static_argnames="cfg")


def run_slam(points, mask, odom, cfg: PipelineConfig, init_pose=None):
    """Full-sequence SLAM as one ``lax.scan`` (configs 2-3 entry point).

    points ``[T, N, 2]``, mask ``[T, N]``, odom ``[T, 3]`` relative deltas.
    Returns ``(final_state, SlamStepOut stacked over T-1 steps)``.
    """
    state0 = init_slam(cfg, points[0], mask[0], init_pose)

    def step(state, inp):
        pts, msk, delta = inp
        return slam_step(state, pts, msk, delta, cfg)

    return jax.lax.scan(step, state0, (points[1:], mask[1:], odom[1:]))


def recover_trajectory(state: SlamState, outs: SlamStepOut, init_pose=None):
    """Final per-scan trajectory: re-anchor each scan on its keyframe's
    *smoothed* pose (loop corrections propagate to every scan).

    Returns ``[T, 3]`` including scan 0.
    """
    anchors = state.graph.poses[outs.kf_idx]            # [T-1, 3]
    poses = se2.compose(anchors, outs.rel)
    p0 = state.graph.poses[0] if init_pose is None else init_pose
    return jnp.concatenate([p0[None].astype(poses.dtype), poses], axis=0)
