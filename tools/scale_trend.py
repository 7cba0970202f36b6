#!/usr/bin/env python3
"""Scale-trend probe: run headline plan shapes on N-fold replicated
lineitem (distinct keys per replica) and print sec/N-fold — evidence
that the plans scale linearly, not quadratically, as data grows.

Usage: python tools/scale_trend.py [sf_dir] [factors...]   (default 1 4 16)
Writes one JSON line: {"factor": {"agg": s, "join": s, "window": s, "sort": s}}
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tmp_parquet_merge_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark("scale-trend")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = li.count()
    out: dict[str, dict[str, float]] = {}
    for n in factors:
        # n distinct replicas with shifted keys — same key cardinality
        # ratio at every factor, so join/agg fan-in grows realistically
        rep = li.withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(n)])))
        rep = rep.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("__r") * F.lit(10_000_000)
        ).drop("__r")
        ordr = orders.withColumn(
            "__r", F.explode(F.array(*[F.lit(i) for i in range(n)]))
        ).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("__r") * F.lit(10_000_000)
        ).drop("__r")
        # document replicas get a rotated alphabet per replica so the
        # corpus grows n× WITHOUT cross-replica near-dups — the
        # dedup-pipeline work scales with the corpus, not with an
        # artificial quadratic pair blowup between identical replicas
        alpha = "abcdefghijklmnopqrstuvwxyz"
        rot = F.col("text")
        for i in range(1, n):
            rot = F.when(
                F.col("__r") == i,
                F.translate("text", alpha, alpha[i % 26 :] + alpha[: i % 26]),
            ).otherwise(rot)
        docr = (
            docs.withColumn(
                "__r", F.explode(F.array(*[F.lit(i) for i in range(n)]))
            )
            .withColumn("doc_id", F.col("doc_id") + F.col("__r") * F.lit(10_000_000))
            .withColumn("text", rot)
            .drop("__r")
        )
        path = tempfile.mkdtemp(prefix=f"tpms_scale_{n}x_")
        rep.write.mode("overwrite").parquet(path + "/li")
        ordr.write.mode("overwrite").parquet(path + "/ord")
        docr.select("doc_id", "text").write.mode("overwrite").parquet(path + "/doc")
        L = spark.read.parquet(path + "/li")
        O = spark.read.parquet(path + "/ord")
        D = spark.read.parquet(path + "/doc")

        def timed(df) -> float:
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            return round(time.perf_counter() - t0, 2)

        res = {
            "rows": L.count(),
            "agg": timed(
                L.groupBy("l_returnflag", "l_linestatus").agg(
                    F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*")
                )
            ),
            "join": timed(
                L.join(O, L.l_orderkey == O.o_orderkey).groupBy("o_orderpriority")
                .agg(F.count("*"))
            ),
            "window": timed(
                L.select(
                    "l_suppkey",
                    F.sum("l_quantity")
                    .over(
                        Window.partitionBy("l_suppkey").orderBy(
                            "l_shipdate", "l_orderkey", "l_linenumber"
                        )
                    )
                    .alias("r"),
                )
            ),
            "sort": timed(L.orderBy("l_extendedprice")),
        }
        from tmp_parquet_merge_spark.operators.dedup import minhash_dedup_pairs

        res["dedup"] = timed(
            minhash_dedup_pairs(D, "text", "doc_id", verify_threshold=0.5)
        )
        out[str(n)] = res
        print(f"# {n}x ({res['rows']} rows): {res}", file=sys.stderr)
    print(json.dumps({"base_rows": base, "trend": out}))


if __name__ == "__main__":
    main()
