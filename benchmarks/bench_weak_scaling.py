"""Weak-scaling REHEARSAL for the distributed Schur solve (config 5).

Real multi-host TPU hardware is not reachable from this machine (one chip
through a tunnel — SURVEY.md §0), so the >=80% weak-scaling contract cannot
be measured for real. This script runs the honest single-machine rehearsal:
N real OS processes (one CPU device each, jax.distributed + collectives)
solving a Manhattan graph whose size grows with N, and reports

    efficiency(N) = solve_time(1 process, V poses)
                  / solve_time(N processes, N*V poses)

CAVEAT printed with the result: the N processes share one host's cores and
memory bandwidth, so this UNDERSTATES true multi-host efficiency (where each
process has its own machine); it still exercises the full cross-process
code path (coordinator, process-spanning mesh, psum over the separator).

Usage: python benchmarks/bench_weak_scaling.py [base_poses] [max_procs]
"""

from __future__ import annotations

import json
import sys

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from ndtpu.dist.launch import launch_local


def main():
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    max_p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    t1 = None
    n = 1
    while n <= max_p:
        rec = launch_local(n, n_poses=base * n, port=29520 + n)
        if n == 1:
            t1 = rec["solve_s"]
        eff = t1 / rec["solve_s"] if rec["solve_s"] > 0 else float("inf")
        print(json.dumps({
            "metric": "weak_scaling_rehearsal", "processes": n,
            "n_poses": base * n, "solve_s": rec["solve_s"],
            "efficiency_vs_1p": round(eff, 3),
            "chi2_after": rec["chi2_after"],
            "caveat": "N processes share one host; understates multi-host",
        }), flush=True)
        n *= 2


if __name__ == "__main__":
    main()
