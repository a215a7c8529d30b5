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


def _ckpt_cfg(tmp_path):
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
    return cfg_path


def test_cli_windowed_checkpoints_are_written(tmp_path):
    """ADVICE r3 (high): with the default --checkpoint-every (scans) and
    window=8 the old double gate first coincided around scan 8000 —
    a windowed run with --checkpoint-dir must produce files for SHORT runs."""
    cfg_path = _ckpt_cfg(tmp_path)
    ck = tmp_path / "ckpts"
    cli.main(["--config", str(cfg_path), "--max-scans", "24",
              "--checkpoint-dir", str(ck), "--checkpoint-every", "8"])
    files = sorted(p.name for p in ck.iterdir())
    assert files and all(f.startswith("ckpt_win_") for f in files), files


def test_cli_checkpoint_modes_are_namespaced(tmp_path):
    """ADVICE r3 (low): scan-mode and windowed-mode states have different
    pytree structures; sharing a directory must not cross-restore."""
    cfg_path = _ckpt_cfg(tmp_path)
    ck = tmp_path / "ckpts"
    cli.main(["--config", str(cfg_path), "--max-scans", "24",
              "--checkpoint-dir", str(ck), "--checkpoint-every", "8"])
    # Resuming in the OTHER mode must not pick up windowed files: it
    # starts fresh (different prefix) instead of crashing on a structure
    # mismatch.
    cli.main(["--config", str(cfg_path), "--max-scans", "12",
              "--mode", "scan", "--resume",
              "--checkpoint-dir", str(ck), "--checkpoint-every", "4"])
    names = sorted(p.name for p in ck.iterdir())
    assert any(n.startswith("ckpt_win_") for n in names)
    assert any(n.startswith("ckpt_scan_") for n in names)


def test_solve_g2o_cli_roundtrip(tmp_path):
    """Standalone pose-graph optimizer CLI (the Pose2SLAMExample_g2o
    workflow): optimize a Manhattan world, write g2o, re-read at optimum."""
    import io
    from contextlib import redirect_stderr

    from ndtpu import solve_g2o
    from ndtpu.data import g2o as g2o_mod
    from ndtpu.graph import factors as fct
    import jax.numpy as jnp

    out = tmp_path / "opt.g2o"
    solve_g2o.main(["--manhattan", "200", "--max-iter", "25",
                    "-o", str(out)])
    data = g2o_mod.read_g2o(str(out))
    g = g2o_mod.to_graph(data, dtype=jnp.float64)
    # The written graph must already be at (near) the optimum.
    chi = float(fct.chi2(g))
    assert chi < 50.0, chi


def test_serve_cli_synthetic(tmp_path):
    """Multi-session serving CLI: S sessions -> per-session trajectories +
    aggregate metrics, with the serving preset applied."""
    from ndtpu import serve as serve_cli

    cfg = {
        "grid": {"x0": -14.0, "y0": -14.0, "cell": 0.5, "nx": 56, "ny": 56,
                 "overlap": 4},
        "keyframe": {"capacity": 64},
        "loop": {"max_candidates": 4, "local_half_extent": 6.0,
                 "min_index_gap": 8},
        "solver": {"inc_iters": 1, "pcg_max_iter": 30},
        "use_loop_closure": True,
        "n_beams": 120,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out_dir = tmp_path / "out"
    summary = serve_cli.main(["--config", str(cfg_path), "--sessions", "2",
                              "--max-scans", "40",
                              "--out-dir", str(out_dir)])
    assert summary["sessions"] == 2
    assert summary["scans_total"] == 80
    for k in range(2):
        traj = np.loadtxt(out_dir / f"traj_{k}.txt")
        assert traj.shape == (40, 3)
        assert np.all(np.isfinite(traj))
        assert summary["per_session"][k]["ate_m"] < 0.3
        assert summary["per_session"][k]["dropped"] == 0
    m = json.loads((out_dir / "serve_metrics.json").read_text())
    assert m["aggregate_scans_per_s"] > 0
