#!/usr/bin/env python3
"""Cross-round scale-sweep drift table (r11 verdict "Next round" #8).

scale_sweep.json is min-merged per round, so 100x-readiness was only
ever a per-round snapshot.  This tool diffs TWO revisions of
scale_sweep.json (git revs, or file paths) and prints the per-query
ratio drift — a rising ratio here is the earliest visible signal of a
plan regression that only bites at scale, before it ever moves the
sf0.1 bench.

Usage:
    python tools/sweep_drift.py [old_rev] [new_rev]
    (defaults: HEAD~1 vs worktree; a rev may also be a file path)

Prints a markdown table of queries whose ratio moved by more than
DRIFT_EPS (0.25 absolute or 15% relative), then a one-line JSON
summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIFT_ABS = 0.25
DRIFT_REL = 0.15


def load(rev: str) -> dict:
    if os.path.isfile(rev):
        with open(rev) as f:
            return json.load(f)
    out = subprocess.run(
        ["git", "-C", ROOT, "show", f"{rev}:scale_sweep.json"],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout)


def queries(d: dict) -> dict:
    d = d.get("queries", d)
    # a query swept before its first bench floor exists carries
    # ratio None — it can't participate in drift math until floored
    return {
        k: v
        for k, v in d.items()
        if isinstance(v, dict) and v.get("ratio") is not None
    }


def main() -> None:
    old_rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    new_rev = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(ROOT, "scale_sweep.json")
    )
    old_q, new_q = queries(load(old_rev)), queries(load(new_rev))
    drifted, improved, added = [], [], []
    for name, nv in sorted(new_q.items()):
        ov = old_q.get(name)
        if ov is None:
            added.append((name, nv["ratio"]))
            continue
        dr = nv["ratio"] - ov["ratio"]
        if dr > DRIFT_ABS and dr / max(ov["ratio"], 1e-9) > DRIFT_REL:
            drifted.append((name, ov["ratio"], nv["ratio"], dr))
        elif -dr > DRIFT_ABS and -dr / max(ov["ratio"], 1e-9) > DRIFT_REL:
            improved.append((name, ov["ratio"], nv["ratio"], dr))
    print(f"# sweep drift: {old_rev} -> {new_rev}")
    print(f"# {len(new_q)} queries, {len(drifted)} worse, "
          f"{len(improved)} better, {len(added)} new")
    if drifted:
        print("\n| query | old ratio | new ratio | drift |\n|---|---|---|---|")
        for n, o, nw, d in sorted(drifted, key=lambda x: -x[3]):
            print(f"| {n} | {o} | {nw} | +{d:.2f} |")
    if improved:
        print("\n| query (improved) | old ratio | new ratio | drift |\n|---|---|---|---|")
        for n, o, nw, d in sorted(improved, key=lambda x: x[3]):
            print(f"| {n} | {o} | {nw} | {d:.2f} |")
    if added:
        print("\nnew queries:", ", ".join(f"{n} ({r}x)" for n, r in added))
    worst = max(new_q.items(), key=lambda kv: kv[1]["ratio"])
    print(json.dumps({
        "metric": "sweep_drift",
        "n_queries": len(new_q),
        "n_worse": len(drifted),
        "n_better": len(improved),
        "n_new": len(added),
        "max_ratio": worst[1]["ratio"],
        "max_ratio_query": worst[0],
    }))


if __name__ == "__main__":
    main()
