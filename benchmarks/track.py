"""Per-commit benchmark tracking (SURVEY.md §5 item 5).

Runs ``bench.py`` and appends its one-line JSON (plus git revision and
timestamp) to ``benchmarks/history.jsonl`` — the cross-commit record that
makes performance regressions visible (VERDICT r2: "nothing tracks numbers
across commits").

Usage: python benchmarks/track.py [--dry]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
HISTORY = os.path.join(HERE, "history.jsonl")


def main():
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
                         capture_output=True, text=True).stdout.strip()
    dirty = bool(subprocess.run(["git", "status", "--porcelain"], cwd=ROOT,
                                capture_output=True, text=True).stdout.strip())
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         cwd=ROOT, capture_output=True, text=True,
                         timeout=1800)
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"bench.py failed rc={out.returncode}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec.update(git=rev + ("+dirty" if dirty else ""),
               ts=round(time.time(), 1))
    line = json.dumps(rec)
    print(line)
    if "--dry" not in sys.argv:
        with open(HISTORY, "a") as f:
            f.write(line + "\n")
        print(f"appended -> {HISTORY}", file=sys.stderr)


if __name__ == "__main__":
    main()
