"""Bucketed-table support: shuffle-free co-located joins.

Spark bucketing requires managed tables (``bucketBy`` only works with
``saveAsTable``), so this module owns a scratch warehouse namespace and
the write-once/join-many pattern: both join sides are written bucketed
by the join key with the same bucket count; subsequent joins read
bucket-aligned splits and Catalyst elides the Exchange on both sides.

At 100 TB this is the standing answer for repeated fact⋈fact joins:
pay one layout shuffle at ingest, then every downstream join is
exchange-free.  (Broadcast handles dim joins; bucketing handles the
joins broadcast can't.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    *,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-within-bucket)
    managed table, replacing any previous version."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # DROP TABLE cleans this metastore's entry, but a previous session
    # (separate derby metastore) may have left the warehouse directory
    # behind — saveAsTable refuses to reuse an existing location.
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        f"{wh.removeprefix('file:')}/{table.lower()}", ignore_errors=True
    )
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join_tables(
    spark: SparkSession,
    *,
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    key_left: str,
    key_right: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Bucket both sides on their join keys and return the co-located
    join (no Exchange on either side — assertable via plans.explain)."""
    write_bucketed(left, left_name, key_left, n_buckets=n_buckets)
    write_bucketed(right, right_name, key_right, n_buckets=n_buckets)
    lt = spark.table(left_name)
    rt = spark.table(right_name)
    # merge hint: force SortMergeJoin so the bucket layout (not an
    # auto-broadcast of the locally-small side) carries the join —
    # this is the plan shape that holds when both sides are huge.
    return lt.hint("merge").join(rt, lt[key_left] == rt[key_right])
