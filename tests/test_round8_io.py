"""Round-8 IO robustness: directory-shaped parquet paths.

Spark writes tables as DIRECTORIES whose names end in .parquet
(…/nation.parquet/part-*.parquet) — the layout every Spark-written
lake has.  The 25× scale stress (SCALE.md, round 8) caught both ops
below crashing on it; these pin the fixes.
"""

import os

import pytest
from pyspark.sql import functions as F

from tmp_parquet_merge_spark.sources import parquet_io


@pytest.fixture(scope="module")
def sparkish_dir(spark, tmp_path_factory):
    """A testdata-shaped dir whose tables are Spark-written
    DIRECTORIES named *.parquet (multi-part, multi-row-group-ready)."""
    base = str(tmp_path_factory.mktemp("sparkish"))
    spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartition(4).write.parquet(os.path.join(base, "nums.parquet"))
    return base


def test_expand_parquet_paths_returns_files_not_dirs(spark, sparkish_dir):
    files = parquet_io._expand_parquet_paths(spark, sparkish_dir)
    assert files, "expansion found nothing"
    assert all(os.path.isfile(f) for f in files), files
    # the table-directory entry itself must not appear
    assert os.path.join(sparkish_dir, "nums.parquet") not in files
    # glob patterns matching the table DIRECTORY expand to its parts
    via_glob = parquet_io._expand_parquet_paths(
        spark, os.path.join(sparkish_dir, "*.parquet")
    )
    assert via_glob == files


def test_metadata_stats_survives_spark_table_layout(spark, sparkish_dir):
    rows = parquet_io.metadata_stats(spark, sparkish_dir).collect()
    assert sum(r.num_rows for r in rows) == 100
    assert all(r.num_columns == 2 for r in rows)


def test_read_row_group_addresses_directory_globally(spark, sparkish_dir):
    table_dir = os.path.join(sparkish_dir, "nums.parquet")
    parts = parquet_io._expand_parquet_paths(spark, table_dir)
    assert len(parts) == 4
    import pyarrow.parquet as pq

    # global row-group i ≡ the i-th group walking sorted part files
    seen = []
    gi = 0
    for f in parts:
        md = pq.ParquetFile(f).metadata
        for g in range(md.num_row_groups):
            got = sorted(
                r.id for r in parquet_io.read_row_group(
                    spark, table_dir, row_group=gi
                ).collect()
            )
            want = sorted(
                pq.ParquetFile(f).read_row_group(g).column("id").to_pylist()
            )
            assert got == want, (f, g, gi)
            seen.extend(got)
            gi += 1
    assert sorted(seen) == list(range(100))
    with pytest.raises(IndexError):
        parquet_io.read_row_group(spark, table_dir, row_group=gi)
