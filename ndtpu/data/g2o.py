"""g2o-format 2D pose-graph IO + Manhattan-world generator.

Capability parity (SURVEY.md §3.2 "SLAM factor library": GTSAM's
``dataset.cpp`` g2o/TORO loaders) plus the synthetic Manhattan-world
generator needed for BASELINE config 4 ("large synthetic Manhattan-world
pose graph (10k+ poses) stressing sparse elimination + relinearization
throughput") — the datasets themselves are not on disk (SURVEY.md §0).

Host-side numpy: parsing/generation is symbolic work done once per dataset,
outside jit (SURVEY.md §8 design stance).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["PoseGraphData", "read_g2o", "read_toro", "write_g2o",
           "manhattan_world", "to_graph"]


class PoseGraphData(NamedTuple):
    """Host-side pose-graph arrays (numpy)."""

    poses: np.ndarray      # [V, 3] initial estimates
    edges_ij: np.ndarray   # [E, 2] int
    edges_z: np.ndarray    # [E, 3]
    edges_info: np.ndarray  # [E, 3, 3] information matrices


def _assemble(path, verts, edges) -> "PoseGraphData":
    if not verts:
        raise ValueError(f"no vertex lines parsed from {path!r}")
    if not edges:
        raise ValueError(f"no edge lines parsed from {path!r}")
    n = max(verts) + 1
    poses = np.zeros((n, 3))
    for k, v in verts.items():
        poses[k] = v
    ij = np.array([[e[0], e[1]] for e in edges], np.int32)
    zz = np.array([e[2] for e in edges])
    ii = np.stack([e[3] for e in edges])
    return PoseGraphData(poses=poses, edges_ij=ij, edges_z=zz, edges_info=ii)


def read_g2o(path: str) -> PoseGraphData:
    """Parse VERTEX_SE2 / EDGE_SE2 lines (the standard 2D g2o dialect)."""
    verts, edges = {}, []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "VERTEX_SE2":
                verts[int(tok[1])] = [float(tok[2]), float(tok[3]),
                                      float(tok[4])]
            elif tok[0] == "EDGE_SE2":
                i, j = int(tok[1]), int(tok[2])
                z = [float(tok[3]), float(tok[4]), float(tok[5])]
                u = [float(t) for t in tok[6:12]]  # upper-tri info
                info = np.array([[u[0], u[1], u[2]],
                                 [u[1], u[3], u[4]],
                                 [u[2], u[4], u[5]]])
                edges.append((i, j, z, info))
    return _assemble(path, verts, edges)


def read_toro(path: str) -> PoseGraphData:
    """Parse TORO-format 2D graphs (``VERTEX2`` / ``EDGE2`` lines).

    Capability parity with GTSAM's ``dataset.cpp`` TORO loader (SURVEY.md
    §3.2 "SLAM factor library"). TORO's six information entries are ordered
    ``I00 I01 I11 I22 I02 I12`` — NOT the g2o upper-triangular row order.
    """
    verts, edges = {}, []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "VERTEX2":
                verts[int(tok[1])] = [float(tok[2]), float(tok[3]),
                                      float(tok[4])]
            elif tok[0] == "EDGE2":
                i, j = int(tok[1]), int(tok[2])
                z = [float(tok[3]), float(tok[4]), float(tok[5])]
                u = [float(t) for t in tok[6:12]]
                info = np.array([[u[0], u[1], u[4]],
                                 [u[1], u[2], u[5]],
                                 [u[4], u[5], u[3]]])
                edges.append((i, j, z, info))
    return _assemble(path, verts, edges)


def write_g2o(path: str, data: PoseGraphData) -> None:
    with open(path, "w") as f:
        for k, p in enumerate(data.poses):
            f.write(f"VERTEX_SE2 {k} {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
        for (i, j), z, info in zip(data.edges_ij, data.edges_z,
                                   data.edges_info):
            u = [info[0, 0], info[0, 1], info[0, 2],
                 info[1, 1], info[1, 2], info[2, 2]]
            f.write(f"EDGE_SE2 {i} {j} {z[0]:.9g} {z[1]:.9g} {z[2]:.9g} "
                    + " ".join(f"{x:.9g}" for x in u) + "\n")


def _compose_np(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array([a[0] + c * b[0] - s * b[1],
                     a[1] + s * b[0] + c * b[1],
                     _wrap(a[2] + b[2])])


def _between_np(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    dx, dy = b[0] - a[0], b[1] - a[1]
    return np.array([c * dx + s * dy, -s * dx + c * dy, _wrap(b[2] - a[2])])


def _wrap(t):
    return (t + np.pi) % (2 * np.pi) - np.pi


def manhattan_world(n_poses: int, seed: int = 0, step: float = 1.0,
                    trans_noise: float = 0.05, rot_noise: float = 0.01,
                    loop_prob: float = 0.1, loop_radius: float = 2.0,
                    min_gap: int = 20) -> PoseGraphData:
    """Standard Manhattan-world simulation (Olson-style): a grid random walk
    with noisy odometry edges and proximity loop closures.

    Returns noisy *initial* poses (dead-reckoned) — the solver must pull the
    trajectory back onto the ground truth (config 4 workload).
    """
    rng = np.random.default_rng(seed)
    gt = np.zeros((n_poses, 3))
    for t in range(1, n_poses):
        # Mostly straight; occasional +-90 deg turns (Manhattan structure).
        turn = rng.choice([0.0, np.pi / 2, -np.pi / 2], p=[0.8, 0.1, 0.1])
        delta = np.array([step, 0.0, turn])
        gt[t] = _compose_np(gt[t - 1], delta)

    info_odo = np.diag([1.0 / trans_noise**2, 1.0 / trans_noise**2,
                        1.0 / rot_noise**2])
    edges = []
    est = np.zeros_like(gt)
    for t in range(1, n_poses):
        z = _between_np(gt[t - 1], gt[t])
        z_noisy = z + np.concatenate([
            rng.normal(0, trans_noise, 2), rng.normal(0, rot_noise, 1)])
        z_noisy[2] = _wrap(z_noisy[2])
        edges.append((t - 1, t, z_noisy, info_odo))
        est[t] = _compose_np(est[t - 1], z_noisy)

    # Loop closures: sample candidate pairs by true proximity.
    info_loop = info_odo
    xy = gt[:, :2]
    for t in range(min_gap, n_poses):
        if rng.random() > loop_prob:
            continue
        d = np.linalg.norm(xy[: t - min_gap] - xy[t], axis=1)
        close = np.nonzero(d < loop_radius)[0]
        if close.size == 0:
            continue
        j = int(rng.choice(close))
        z = _between_np(gt[j], gt[t])
        z_noisy = z + np.concatenate([
            rng.normal(0, trans_noise, 2), rng.normal(0, rot_noise, 1)])
        z_noisy[2] = _wrap(z_noisy[2])
        edges.append((j, t, z_noisy, info_loop))

    ij = np.array([[e[0], e[1]] for e in edges], np.int32)
    zz = np.array([e[2] for e in edges])
    ii = np.stack([e[3] for e in edges])
    return PoseGraphData(poses=est, edges_ij=ij, edges_z=zz, edges_info=ii)


def to_graph(data: PoseGraphData, dtype=None, prior_on_first: bool = True):
    """Build an ndtpu ``PoseGraph`` from host arrays (exact capacity)."""
    import jax.numpy as jnp

    from ndtpu.graph import factors as fct

    dtype = dtype or jnp.float32
    v = data.poses.shape[0]
    e = data.edges_ij.shape[0]
    g = fct.empty_graph(v, 1, e, dtype)
    sqrt_infos = np.linalg.cholesky(data.edges_info).transpose(0, 2, 1)
    g = g._replace(
        poses=jnp.asarray(data.poses, dtype),
        pose_mask=jnp.ones((v,), bool),
        bet_i=jnp.asarray(data.edges_ij[:, 0], jnp.int32),
        bet_j=jnp.asarray(data.edges_ij[:, 1], jnp.int32),
        bet_z=jnp.asarray(data.edges_z, dtype),
        bet_sqrt_info=jnp.asarray(sqrt_infos, dtype),
        bet_mask=jnp.ones((e,), bool),
        n_poses=jnp.asarray(v, jnp.int32),
        n_between=jnp.asarray(e, jnp.int32),
    )
    if prior_on_first:
        sq = jnp.asarray(np.diag([100.0, 100.0, 100.0]), dtype)
        g = fct.add_prior(g, 0, jnp.asarray(data.poses[0], dtype), sq)
    return g
