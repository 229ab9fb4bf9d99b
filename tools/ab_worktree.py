"""Interleaved same-session A/B of bench.py between two checkouts.

Round-10 verdict task 2: settle which of the 12 driver-flagged sf0.1
regressions are real by benching HEAD (/root/repo) against an r8-HEAD
worktree (30f5998) on the SAME boot, alternating runs A,B,A,B,... so
host drift hits both sides equally. Prints a per-query table of
min-across-pairs for each side plus the ratio.

    python tools/ab_worktree.py --pairs 3 [--dir-a /root/wt_r8] \
        [--dir-b /root/repo] [--sf-dir ...] [--queries q1,q2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_bench(root: str, env: dict) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        capture_output=True, text=True, check=True, env=env, cwd=root,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir-a", default="/root/wt_r8")
    ap.add_argument("--dir-b", default="/root/repo")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    env = dict(os.environ)
    if args.sf_dir:
        env["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    if args.queries:
        env["SPARK_GRAFT_QUERIES"] = args.queries

    runs_a, runs_b = [], []
    for i in range(args.pairs):
        print(f"pair {i + 1}/{args.pairs}: A ({args.dir_a}) ...",
              file=sys.stderr)
        runs_a.append(run_bench(args.dir_a, env))
        print(f"pair {i + 1}/{args.pairs}: B ({args.dir_b}) ...",
              file=sys.stderr)
        runs_b.append(run_bench(args.dir_b, env))

    qa = {q: min(r["queries"][q] for r in runs_a)
          for q in runs_a[0]["queries"]}
    qb = {q: min(r["queries"][q] for r in runs_b)
          for q in runs_b[0]["queries"]}
    common = sorted(set(qa) & set(qb))
    print(f"\nboot={runs_a[0].get('boot_id', '?')} pairs={args.pairs}")
    print(f"{'query':<34} {'A(r8) s':>9} {'B(now) s':>9} {'B/A':>6}")
    ta = tb = 0.0
    for q in common:
        ta += qa[q]
        tb += qb[q]
        print(f"{q:<34} {qa[q]:>9.3f} {qb[q]:>9.3f} {qb[q] / qa[q]:>6.2f}")
    print(f"{'TOTAL':<34} {ta:>9.3f} {tb:>9.3f} {tb / ta:>6.2f}")
    print("\nper-run totals A:", [r["value"] for r in runs_a])
    print("per-run totals B:", [r["value"] for r in runs_b])


if __name__ == "__main__":
    main()
