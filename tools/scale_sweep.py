#!/usr/bin/env python3
"""Repeatable full-registry K-fold scale sweep (r10 verdict #4).

Materializes a K-fold replica of the bench tier (tools/
make_scaled_dir.py semantics: shifted keys, decorrelated payloads),
runs the FULL bench headline registry on it with the watchlist
machinery disabled (SPARK_GRAFT_SCALE_MODE=1 — every query
legitimately exceeds its sf0.1 floor on K× data, so regression
adjudication would re-run the whole registry pointlessly, and K-fold
times must never min-merge into the sf0.1 floors), then records the
per-query ratio to the best-known sf0.1 floor in scale_sweep.json.

scale_sweep.json is min-merged across rounds exactly like the
watchlist: each query keeps its best-known scaled time, so the RATIO
column is the best-measured scale shape and cross-round drift is a
plain git diff — the real 100×-readiness signal (a plan regression
that only bites at scale shows up as a rising ratio here before it
ever moves the sf0.1 bench).

Usage: python tools/scale_sweep.py [sf_dir] [K] [--reuse DIR]
       (defaults: /root/testdata/sf0.1  25)

--reuse DIR skips replica materialization and sweeps DIR directly
(e.g. to re-measure on an already-built replica).

Prints a summary table to stderr and ONE JSON line to stdout:
  {"metric": "scale_sweep_total", "value": total_sec, "k": K,
   "n_queries": N, "median_ratio": r, "max_ratio": r, "errors": [...]}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    reuse = None
    if "--reuse" in args:
        i = args.index("--reuse")
        reuse = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    k = int(args[1]) if len(args) > 1 else 25

    if reuse:
        scaled = reuse
    else:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "make_scaled_dir.py"),
             sf_dir, str(k)],
            check=True, capture_output=True, text=True,
        )
        scaled = out.stdout.strip().splitlines()[-1]
    if not os.path.isdir(scaled):
        sys.exit(f"scaled dir missing: {scaled!r}")

    detail_path = tempfile.mktemp(prefix="scale_sweep_detail_", suffix=".json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SCALE_MODE="1",
        SPARK_GRAFT_DETAIL_PATH=detail_path,
    )
    print(f"# sweeping {scaled} (K={k})", file=sys.stderr)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), scaled],
        env=env, text=True, capture_output=True,
    )
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        sys.exit(f"bench.py failed rc={proc.returncode}")
    with open(detail_path) as f:
        detail = json.load(f)
    os.unlink(detail_path)
    timings: dict[str, float] = detail["queries"]
    errors = sorted(detail.get("errors", {}))

    try:
        with open(os.path.join(ROOT, "bench_watchlist.json")) as f:
            floors = json.load(f)
    except (OSError, ValueError):
        floors = {}
    sweep_path = os.path.join(ROOT, "scale_sweep.json")
    try:
        with open(sweep_path) as f:
            record = json.load(f)
    except (OSError, ValueError):
        record = {"k": k, "queries": {}}
    if record.get("k") != k:
        # ratios at different K are not comparable — start fresh
        record = {"k": k, "queries": {}}

    merged = record["queries"]
    for name, s in timings.items():
        prev = merged.get(name, {}).get("scaled")
        best = round(min(s, prev), 3) if prev is not None else round(s, 3)
        floor = floors.get(name)
        merged[name] = {
            "floor": floor,
            "scaled": best,
            "ratio": round(best / floor, 2) if floor else None,
        }
    record["queries"] = dict(sorted(merged.items()))
    with open(sweep_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)

    ratios = sorted(
        q["ratio"] for q in merged.values() if q.get("ratio") is not None
    )
    for name, q in sorted(
        merged.items(), key=lambda kv: -(kv[1].get("ratio") or 0)
    )[:15]:
        print(
            f"# {name}: {q['scaled']}s / floor {q['floor']}s = "
            f"{q['ratio']}x", file=sys.stderr,
        )
    out = {
        "metric": "scale_sweep_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "k": k,
        "n_queries": len(timings),
        "median_ratio": ratios[len(ratios) // 2] if ratios else None,
        "max_ratio": ratios[-1] if ratios else None,
        "errors": errors[:10],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
