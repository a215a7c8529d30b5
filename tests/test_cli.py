"""L7 CLI runner: end-to-end invocation writes trajectory + metrics."""

import json

import numpy as np

from ndtpu import run as cli


def test_cli_synthetic_run(tmp_path):
    cfg = {
        "grid": {"x0": -12.0, "y0": -12.0, "cell": 1.0, "nx": 24, "ny": 24,
                 "overlap": 4},
        "keyframe": {"capacity": 32},
        "loop": {"max_candidates": 4, "local_half_extent": 6.0},
        "solver": {"inc_iters": 1, "pcg_max_iter": 30},
        "use_loop_closure": False,
        "n_beams": 90,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    traj_path = tmp_path / "traj.txt"
    metrics_path = tmp_path / "m.jsonl"

    cli.main(["--config", str(cfg_path), "--max-scans", "12",
              "--out-traj", str(traj_path),
              "--out-metrics", str(metrics_path)])

    traj = np.loadtxt(traj_path)
    assert traj.shape == (12, 3)
    assert np.all(np.isfinite(traj))
    lines = [json.loads(line) for line in metrics_path.read_text().splitlines()]
    # Default (windowed) mode: one record per window (ceil(11/8) = 2)
    # + summary.
    assert len(lines) == 3
    assert "summary" in lines[-1]


def test_cli_scan_mode_per_scan_records(tmp_path):
    cfg = {
        "grid": {"x0": -12.0, "y0": -12.0, "cell": 1.0, "nx": 24, "ny": 24,
                 "overlap": 4},
        "keyframe": {"capacity": 32},
        "loop": {"max_candidates": 4, "local_half_extent": 6.0},
        "solver": {"inc_iters": 1, "pcg_max_iter": 30},
        "use_loop_closure": False,
        "n_beams": 90,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    traj_path = tmp_path / "traj.txt"
    metrics_path = tmp_path / "m.jsonl"

    cli.main(["--config", str(cfg_path), "--max-scans", "12",
              "--mode", "scan",
              "--out-traj", str(traj_path),
              "--out-metrics", str(metrics_path)])

    traj = np.loadtxt(traj_path)
    assert traj.shape == (12, 3)
    lines = [json.loads(line) for line in metrics_path.read_text().splitlines()]
    assert len(lines) == 12  # 11 scan records + summary
    assert "summary" in lines[-1]
