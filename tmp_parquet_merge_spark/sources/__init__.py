from tmp_parquet_merge_spark.sources.parquet_io import (
    merge_files,
    metadata_stats,
    read_parquet,
    read_row_group,
    schema_dump,
    write_parquet,
)

__all__ = [
    "read_parquet",
    "write_parquet",
    "merge_files",
    "schema_dump",
    "metadata_stats",
    "read_row_group",
]
