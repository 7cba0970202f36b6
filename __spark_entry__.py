"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``tmp_parquet_merge_spark.queries.REGISTRY`` — the
single source of truth binding each declared operator (SURVEY.md §2)
to its Spark builder and DuckDB oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from tmp_parquet_merge_spark.queries import REGISTRY  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style aggregation) on sf0.001."""
    return REGISTRY["q_agg_basic"].build(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (absent ⇒ rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
