"""Multi-process distributed bring-up (SURVEY.md §8 Phase E, BASELINE
config 5 ">=2 hosts"): spawn 2 real OS processes, each with one CPU device,
connected via ``jax.distributed.initialize`` — the honest single-machine
rehearsal of the multi-host path. The distributed Schur solve must converge
across the process boundary, and agree with the single-process solver."""

import json

import numpy as np
from ndtpu.dist.launch import launch_local


def test_two_process_schur_converges_and_matches_single_process():
    rec = launch_local(2, n_poses=120)
    assert rec["num_processes"] == 2
    assert rec["n_devices"] == 2
    assert rec["chi2_after"] < rec["chi2_before"] / 100, rec

    # Single-process reference on the identical problem.
    import jax.numpy as jnp
    from ndtpu.config import SolverConfig
    from ndtpu.data import g2o
    from ndtpu.graph import factors as fct
    from ndtpu.graph import solve as slv

    data = g2o.manhattan_world(120, seed=0, loop_prob=0.2)
    g = g2o.to_graph(data, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    g = g._replace(poses=g.poses + jnp.asarray(
        rng.normal(0, 0.05, g.poses.shape), jnp.float32))
    res = slv.optimize(g, SolverConfig(max_iter=10), method="dense")
    chi_ref = float(fct.chi2(res.graph))
    # Both optimizers drive chi^2 to (near) zero on this well-posed problem.
    assert rec["chi2_after"] <= max(10.0 * max(chi_ref, 1e-9), 1e-6), (
        rec["chi2_after"], chi_ref)


def test_two_process_multi_session_slam():
    """North-star 'N hosts' for the PIPELINE (VERDICT r3 item 5): 2 real OS
    processes over jax.distributed, one full windowed SLAM session per
    process via dist.run_sessions_sharded; both sessions must close loops
    and land at sane ATE."""
    from ndtpu.dist.launch import launch_local

    rec = launch_local(2, n_poses=48, port=29533, task="slam")
    assert rec["task"] == "slam" and rec["n_devices"] == 2
    assert all(k > 5 for k in rec["keyframes"]), rec
    assert all(a < 0.3 for a in rec["ates"]), rec
