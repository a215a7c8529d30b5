"""CARMEN 2D lidar log parser (Intel Research Lab / MIT Killian format).

Capability parity (SURVEY.md §3.1 "Dataset reader", L0 layer): parses
``FLASER`` (and ``ROBOTLASER1``) lines — the format the Intel/MIT sequences
are distributed in — into padded ``[T, N]`` range tensors plus odometry.
The datasets themselves are absent from this machine (SURVEY.md §0); this
parser is exercised by round-trip tests on generated logs so real logs work
the moment they are available.

Format (CARMEN logger docs):
  FLASER num_readings r_1 ... r_n x y theta odom_x odom_y odom_theta ts host log_ts
  ROBOTLASER1 type start_angle fov resolution max_range accuracy remission
    num_readings r_1 ... r_n [remissions] x y theta odom_* ... (variant)

Host-side numpy; the optional C accelerator (``ndtpu.native``) parses large
logs with the same semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["CarmenLog", "read_carmen", "write_carmen", "to_sequence"]


class CarmenLog(NamedTuple):
    """Raw parsed log: ranges padded to the max beam count."""

    ranges: np.ndarray     # [T, N] float32 (padded with max_range sentinel)
    n_beams: np.ndarray    # [T] int32 true beam count per scan
    laser_pose: np.ndarray  # [T, 3] laser pose from the log (x, y, theta)
    odom_pose: np.ndarray  # [T, 3] raw odometry pose
    timestamps: np.ndarray  # [T] float64


def read_carmen(path: str, max_range: float = 81.9) -> CarmenLog:
    """Parse FLASER/ROBOTLASER1 lines from a CARMEN log file."""
    ranges_l, nb_l, lp_l, op_l, ts_l = [], [], [], [], []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "FLASER":
                n = int(tok[1])
                r = np.asarray([float(t) for t in tok[2: 2 + n]], np.float32)
                rest = tok[2 + n:]
                lp = [float(x) for x in rest[0:3]]
                op = [float(x) for x in rest[3:6]]
                ts = float(rest[6]) if len(rest) > 6 else 0.0
            elif tok[0] == "ROBOTLASER1":
                # laser_type start_angle fov ang_res max_range accuracy
                # remission_mode num_readings r... num_remissions [rem...]
                n = int(tok[8])
                r = np.asarray([float(t) for t in tok[9: 9 + n]], np.float32)
                k = 9 + n
                n_rem = int(tok[k])
                k += 1 + n_rem
                lp = [float(x) for x in tok[k: k + 3]]
                op = [float(x) for x in tok[k + 3: k + 6]]
                ts = float(tok[k + 12]) if len(tok) > k + 12 else 0.0
            else:
                continue
            ranges_l.append(r)
            nb_l.append(n)
            lp_l.append(lp)
            op_l.append(op)
            ts_l.append(ts)

    if not ranges_l:
        raise ValueError(f"no laser lines found in {path}")
    nmax = max(nb_l)
    t = len(ranges_l)
    ranges = np.full((t, nmax), max_range, np.float32)
    for i, r in enumerate(ranges_l):
        ranges[i, : len(r)] = r
    return CarmenLog(
        ranges=ranges,
        n_beams=np.asarray(nb_l, np.int32),
        laser_pose=np.asarray(lp_l, np.float64),
        odom_pose=np.asarray(op_l, np.float64),
        timestamps=np.asarray(ts_l, np.float64),
    )


def write_carmen(path: str, log: CarmenLog) -> None:
    """Write FLASER lines (round-trip/testing; also lets synthetic sequences
    be exported in the reference's input format)."""
    with open(path, "w") as f:
        for i in range(log.ranges.shape[0]):
            n = int(log.n_beams[i])
            r = " ".join(f"{x:.3f}" for x in log.ranges[i, :n])
            lp = " ".join(f"{x:.6f}" for x in log.laser_pose[i])
            op = " ".join(f"{x:.6f}" for x in log.odom_pose[i])
            f.write(f"FLASER {n} {r} {lp} {op} {log.timestamps[i]:.6f} "
                    f"host 0.0\n")


def to_sequence(log: CarmenLog, fov: float = np.pi, min_range: float = 0.1,
                max_range: float = 50.0, dtype=np.float32):
    """Convert a parsed log to the pipeline's input tensors.

    Returns ``(points [T, N, 2], mask [T, N], odom [T, 3])`` where odom is
    the relative odometry delta in the robot frame (delta[0] = identity) —
    the exact inputs of :func:`ndtpu.slam.pipeline.run_slam`.

    CARMEN SICK scans sweep ``fov`` radians centered on the robot's heading
    (Intel/MIT logs: 180 deg, 180 or 360 beams).
    """
    t, n = log.ranges.shape
    beam_idx = np.arange(n)
    angles = (-fov / 2 + fov * beam_idx / max(n - 1, 1)).astype(dtype)
    valid_beam = beam_idx[None, :] < log.n_beams[:, None]
    r = log.ranges.astype(dtype)
    mask = valid_beam & (r > min_range) & (r < 0.999 * max_range)
    pts = np.stack([r * np.cos(angles), r * np.sin(angles)],
                   axis=-1).astype(dtype)

    op = log.odom_pose
    deltas = np.zeros((t, 3), dtype)
    for k in range(1, t):
        a, b = op[k - 1], op[k]
        c, s = np.cos(a[2]), np.sin(a[2])
        dx, dy = b[0] - a[0], b[1] - a[1]
        dth = (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi
        deltas[k] = [c * dx + s * dy, -s * dx + c * dy, dth]
    return pts, mask, deltas
