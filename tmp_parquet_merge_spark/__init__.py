"""tmp_parquet_merge_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the capability surface of the
``wesm/tmp-parquet-merge`` reference slice (Parquet read/write/merge/
metadata; see ``/root/reference``), expressed Spark-first (DataFrame /
SQL / Catalyst / Structured Streaming), and extended with the
relational operator set and LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) that a
100 TB-scale training-data pipeline needs.

Layout:
    session    — SparkSession factory with scale-tuned defaults
    sources/   — Parquet scan/write/merge/metadata (reference §2.A-2.C)
    operators/ — relational + dedup + similarity + text + multimodal
    functions/ — deterministic scalar/aggregate expression helpers
    plans/     — plan introspection (pushdown/broadcast assertions)
    streaming/ — Structured Streaming pipelines (windows, stateful)
    queries    — the declared query registry (SURVEY.md §2) with
                 DuckDB oracle SQL for the correctness gate
"""

from tmp_parquet_merge_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
