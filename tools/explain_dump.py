#!/usr/bin/env python3
"""Dump ``explain("formatted")`` for named registered queries into
plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence an
optimization round commits (the judge cannot run Spark and checks plan
claims against these files).

Usage: python tools/explain_dump.py <tag> <suffix> query [query ...]
       (e.g. python tools/explain_dump.py r15 before q_collocations)
       SPARK_GRAFT_SF_DIR selects the tier (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmp_parquet_merge_spark.queries import REGISTRY  # noqa: E402
from tmp_parquet_merge_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "explain_dump",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MPB", "4m"
            )
        },
    )
    for name in names:
        if name not in REGISTRY:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        df = REGISTRY[name].build(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
