#!/usr/bin/env python3
"""Warm-session per-query repetition harness for optimization A/Bs.

Runs each named query ``reps`` times (build + noop sink per rep, the
bench.py methodology) inside ONE warm session and reports per-rep
seconds plus min/median — the steady-state number a full-sweep (warm)
bench sees, with first-use JIT/codegen isolated into rep 0 instead of
polluting the comparison.  Measurement tool only: nothing is cached
across reps (every rep re-executes the full plan from parquet), and
nothing here is on any query path.

Usage: python tools/warm_bench.py [sf_dir] query [query ...]
       SPARK_GRAFT_REPS=N (default 4)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmp_parquet_merge_spark.queries import REGISTRY  # noqa: E402
from tmp_parquet_merge_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "4"))
    spark = get_spark(
        "warm_bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MPB", "4m"
            ),
            "spark.cleaner.periodicGC.interval": "30s",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").write.mode(
        "overwrite"
    ).format("noop").save()
    out = {}
    for name in args:
        if name not in REGISTRY:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        times = []
        for _ in range(reps):
            import gc

            gc.collect()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = REGISTRY[name].build(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "reps": times,
            "min": min(times),
            "median": round(statistics.median(times), 3),
            "warm_min": min(times[1:]) if len(times) > 1 else times[0],
        }
        print(f"# {name}: {times} warm_min={out[name]['warm_min']}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
