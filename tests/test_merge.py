"""File-merge tests — the repo namesake capability (SURVEY §2.A) plus
schema-evolution merge (FIXTURES §A3)."""

import glob

from pyspark.sql import functions as F

from tmp_parquet_merge_spark.sources import fixtures, parquet_io


def test_merge_files_row_conservation(spark, tmp_path):
    a, b, out = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m")
    df = fixtures.int_str_df(spark)
    parquet_io.write_parquet(df, a)
    parquet_io.write_parquet(df, b)
    merged = parquet_io.merge_files(spark, [a, b], out)
    assert merged.count() == 10
    assert len(glob.glob(out + "/*.parquet")) == 1  # compacted


def test_merge_schema_evolution(spark, tmp_path):
    a, b, out = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m")
    v1 = fixtures.int_str_df(spark)
    v2 = v1.withColumn("extra", F.col("int") * 10)
    parquet_io.write_parquet(v1, a)
    parquet_io.write_parquet(v2, b)
    merged = parquet_io.merge_files(spark, [a, b], out, merge_schema=True)
    assert set(merged.columns) == {"int", "str", "extra"}
    assert merged.count() == 10
    # rows from gen1 carry NULL extra; gen2 rows carry values
    assert merged.filter(F.col("extra").isNull()).count() == 5
    assert merged.filter(F.col("extra") == 10).count() == 1


def test_metadata_stats(spark, sf_dir):
    stats = parquet_io.metadata_stats(spark, sf_dir).collect()
    by_file = {r.file.split("/")[-1]: r for r in stats}
    assert by_file["lineitem.parquet"].num_rows == 6000
    assert by_file["region.parquet"].num_columns == 2
    assert all(r.num_row_groups >= 1 for r in stats)


def test_schema_dump(spark, sf_dir):
    row = parquet_io.schema_dump(spark, sf_dir + "/region.parquet").collect()[0]
    assert "r_regionkey" in row.simple_string and "r_name" in row.simple_string


def test_row_group_read(spark, sf_dir):
    df = parquet_io.read_row_group(spark, sf_dir + "/nation.parquet", 0)
    assert df.count() == 25  # single row group at this size
    one_col = parquet_io.read_row_group(
        spark, sf_dir + "/nation.parquet", 0, columns=["n_name"]
    )
    assert one_col.columns == ["n_name"]
