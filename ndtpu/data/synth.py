"""Synthetic 2D lidar worlds, trajectories, and scan simulation.

The reference validates on the Intel Research Lab / MIT Killian Court CARMEN
logs; those are not on disk and cannot be downloaded (SURVEY.md §0), so all
integration tests and benchmarks run on a synthetic simulator with *known*
ground truth — which is strictly stronger for correctness testing (SURVEY.md
§5 item 3). The CARMEN parser for the real logs lives in
``ndtpu.data.carmen`` for when the datasets become available.

Everything here is vectorized JAX: raycasting is a ``[T, N_beams, S_segments]``
broadcasted intersection test, so simulating a full sequence is one jit call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ndtpu.lie import se2

__all__ = [
    "World",
    "box_world",
    "corridor_loop_world",
    "rectangle_trajectory",
    "raycast",
    "simulate_scans",
    "noisy_odometry",
    "polar_to_xy",
    "beam_angles",
    "Sequence2D",
    "make_sequence",
]


class World(NamedTuple):
    """Line-segment world: segments ``[S, 2, 2]`` as (start, end) points."""

    segments: jax.Array


def _rect(x0, y0, x1, y1):
    return [
        [[x0, y0], [x1, y0]],
        [[x1, y0], [x1, y1]],
        [[x1, y1], [x0, y1]],
        [[x0, y1], [x0, y0]],
    ]


def box_world(half: float = 12.0) -> World:
    """Rectangular room with interior obstacles — rich structure for NDT."""
    segs = _rect(-half, -half, half, half)
    segs += _rect(-half * 0.5, -half * 0.4, -half * 0.2, half * 0.1)
    segs += _rect(half * 0.25, -half * 0.6, half * 0.55, -half * 0.25)
    segs += _rect(half * 0.2, half * 0.35, half * 0.7, half * 0.6)
    segs += [[[-half * 0.7, half * 0.5], [-half * 0.3, half * 0.8]]]  # diagonal
    return World(segments=jnp.asarray(segs, jnp.float32))


def corridor_loop_world(outer: float = 20.0, width: float = 4.0) -> World:
    """Square ring corridor (MIT-Killian-style loop, SURVEY.md §1 config 3).

    Driving the ring and returning to the start exercises loop closure.
    Small wall notches break the corridor's translational symmetry so
    scan matching is observable along the corridor axis.
    """
    inner = outer - width
    segs = _rect(-outer, -outer, outer, outer)
    segs += _rect(-inner, -inner, inner, inner)
    # Notches on the outer wall every few meters (doorframe-like features).
    rng = np.random.default_rng(7)
    for k in range(-3, 4):
        x = k * outer / 3.5 + rng.uniform(-0.5, 0.5)
        d = 0.6
        segs += [
            [[x, -outer], [x, -outer + d]],
            [[x + 0.8, outer], [x + 0.8, outer - d]],
            [[-outer, x], [-outer + d, x]],
            [[outer, x + 0.8], [outer - d, x + 0.8]],
        ]
    return World(segments=jnp.asarray(segs, jnp.float32))


def rectangle_trajectory(n_steps: int, half: float, step: float = 0.25,
                         dtype=jnp.float32) -> jax.Array:
    """Poses ``[T, 3]`` driving a rounded rectangle CCW, heading tangent.

    Parametrized by arc length so consecutive poses are ``step`` apart; the
    loop closes after the perimeter, producing true loop-closure events.
    """
    perim = 8.0 * half
    t = np.arange(n_steps) * step
    u = (t % perim) / perim * 4.0  # side index in [0, 4)
    xs, ys, hs = [], [], []
    for ui in u:
        side, frac = int(ui), ui - int(ui)
        if side == 0:
            x, y, h = -half + 2 * half * frac, -half, 0.0
        elif side == 1:
            x, y, h = half, -half + 2 * half * frac, np.pi / 2
        elif side == 2:
            x, y, h = half - 2 * half * frac, half, np.pi
        else:
            x, y, h = -half, half - 2 * half * frac, -np.pi / 2
        xs.append(x), ys.append(y), hs.append(h)
    poses = np.stack([xs, ys, np.unwrap(hs)], axis=-1)
    # Smooth heading discontinuities at corners with a small moving average.
    k = 5
    pad = np.pad(poses[:, 2], (k // 2, k // 2), mode="edge")
    poses[:, 2] = np.convolve(pad, np.ones(k) / k, mode="valid")[:n_steps]
    poses[:, 2] = (poses[:, 2] + np.pi) % (2 * np.pi) - np.pi
    return jnp.asarray(poses, dtype)


def beam_angles(n_beams: int, fov: float = 2.0 * np.pi, dtype=jnp.float32):
    """Evenly spaced beam angles ``[N]`` in the sensor frame."""
    return jnp.linspace(-fov / 2, fov / 2, n_beams, endpoint=False, dtype=dtype)


def raycast(world: World, poses, angles, max_range: float, eps: float = 1e-9):
    """Ranges ``[..., N]`` of beams from ``poses [..., 3]`` at ``angles [N]``.

    Broadcasted ray/segment intersection over ``[..., N, S]`` — the whole
    sequence simulates in one fused XLA program.
    """
    a = world.segments[:, 0]                   # [S, 2]
    ab = world.segments[:, 1] - a              # [S, 2]
    th = poses[..., 2:3] + angles              # [..., N]
    d = jnp.stack([jnp.cos(th), jnp.sin(th)], axis=-1)       # [..., N, 2]
    # Broadcast: origins [..., 1, 1, 2] vs segments [S, 2].
    orig = poses[..., None, None, :2]                         # [..., 1, 1, 2]
    ao = a - orig                                             # [..., 1, S, 2]
    dn = d[..., :, None, :]                                   # [..., N, 1, 2]
    denom = dn[..., 0] * ab[..., 1] - dn[..., 1] * ab[..., 0]   # [..., N, S]
    denom_safe = jnp.where(jnp.abs(denom) < eps, 1.0, denom)
    t = (ao[..., 0] * ab[..., 1] - ao[..., 1] * ab[..., 0]) / denom_safe
    u = (ao[..., 0] * dn[..., 1] - ao[..., 1] * dn[..., 0]) / denom_safe
    hit = (jnp.abs(denom) >= eps) & (t > 1e-4) & (u >= 0.0) & (u <= 1.0)
    t = jnp.where(hit, t, max_range)
    return jnp.min(t, axis=-1)                                # [..., N]


def simulate_scans(world: World, poses, angles, max_range: float,
                   noise_std: float, key) -> jax.Array:
    """Noisy range scans ``[T, N]`` along a trajectory ``[T, 3]``."""
    ranges = raycast(world, poses, angles, max_range)
    noise = noise_std * jax.random.normal(key, ranges.shape, ranges.dtype)
    return jnp.where(ranges < max_range, jnp.maximum(ranges + noise, 0.0),
                     max_range)


def noisy_odometry(poses, key, trans_std: float = 0.02, rot_std: float = 0.005):
    """Simulated wheel odometry: true relative poses with per-step noise.

    Returns deltas ``[T, 3]``; deltas[0] is identity. Matches the reference's
    use of odometry as the registration initial guess (SURVEY.md §4.1).
    """
    rel = se2.between(poses[:-1], poses[1:])                  # [T-1, 3]
    k1, k2 = jax.random.split(key)
    noise_t = trans_std * jax.random.normal(k1, rel[..., :2].shape, rel.dtype)
    noise_r = rot_std * jax.random.normal(k2, rel[..., 2:].shape, rel.dtype)
    noisy = jnp.concatenate([rel[..., :2] + noise_t,
                             se2.wrap(rel[..., 2:] + noise_r)], axis=-1)
    ident = jnp.zeros((1, 3), poses.dtype)
    return jnp.concatenate([ident, noisy], axis=0)


def polar_to_xy(ranges, angles, min_range: float, max_range: float):
    """Scan preprocessing (SURVEY.md §3.1): polar → Cartesian + validity mask.

    ranges ``[..., N]``, angles ``[N]`` → points ``[..., N, 2]``, mask ``[..., N]``.
    """
    x = ranges * jnp.cos(angles)
    y = ranges * jnp.sin(angles)
    mask = (ranges > min_range) & (ranges < 0.999 * max_range)
    return jnp.stack([x, y], axis=-1), mask


class Sequence2D(NamedTuple):
    """A simulated dataset: everything configs 1-3 need (SURVEY.md §7)."""

    points: jax.Array   # [T, N, 2] sensor-frame points
    mask: jax.Array     # [T, N]
    odom: jax.Array     # [T, 3] noisy relative odometry (delta[0] = identity)
    gt_poses: jax.Array  # [T, 3] ground-truth trajectory
    angles: jax.Array   # [N]


def make_sequence(world: World, poses, n_beams: int, max_range: float,
                  min_range: float, seed: int = 0, range_noise: float = 0.01,
                  odom_trans_std: float = 0.02, odom_rot_std: float = 0.005,
                  ) -> Sequence2D:
    """Simulate a full sequence: scans + noisy odometry + ground truth."""
    key = jax.random.PRNGKey(seed)
    k_scan, k_odom = jax.random.split(key)
    angles = beam_angles(n_beams, dtype=poses.dtype)
    ranges = simulate_scans(world, poses, angles, max_range, range_noise, k_scan)
    points, mask = polar_to_xy(ranges, angles, min_range, max_range)
    odom = noisy_odometry(poses, k_odom, odom_trans_std, odom_rot_std)
    return Sequence2D(points=points, mask=mask, odom=odom, gt_poses=poses,
                      angles=angles)
