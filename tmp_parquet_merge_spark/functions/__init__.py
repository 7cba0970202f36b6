from tmp_parquet_merge_spark.functions.deterministic import (
    davg,
    dec6,
    dsum,
    dsum_expr,
)

__all__ = ["dec6", "dsum", "dsum_expr", "davg"]
