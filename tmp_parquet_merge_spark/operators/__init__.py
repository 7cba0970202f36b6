from tmp_parquet_merge_spark.operators.relational import (
    asof_join,
    range_join,
    top_k,
)

__all__ = ["asof_join", "range_join", "top_k"]
