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


def test_row_group_read_addresses_middle_group(spark, tmp_path):
    # q_rowgroup_read's oracle leans on the single-row-group identity
    # (RowGroup(0) == full table for the bundled nation file); this
    # pins the actual ADDRESSING semantics on a multi-group file —
    # group i must return exactly the i-th written slice, not the
    # file head or the whole table
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "multi_rg.parquet")
    pq.write_table(
        pa.table({"v": list(range(100))}), path, row_group_size=30
    )
    assert pq.ParquetFile(path).metadata.num_row_groups == 4
    g1 = parquet_io.read_row_group(spark, path, 1)
    assert sorted(r.v for r in g1.collect()) == list(range(30, 60))
    g3 = parquet_io.read_row_group(spark, path, 3)  # short tail group
    assert sorted(r.v for r in g3.collect()) == list(range(90, 100))


def test_row_group_read_refuses_oversized_group(spark, sf_dir):
    # inspection-only contract: a group over the byte ceiling is
    # refused with a pointer at the distributed read path
    import pytest

    with pytest.raises(ValueError, match="read_parquet"):
        parquet_io.read_row_group(
            spark, sf_dir + "/nation.parquet", 0, max_bytes=16
        )


def test_merge_files_accepts_glob_inputs(spark, sf_dir, tmp_path):
    # read_parquet advertises glob support; merge_files must size its
    # output from glob inputs instead of crashing on getFileStatus
    out = str(tmp_path / "glob_merged")
    merged = parquet_io.merge_files(
        spark, [sf_dir + "/nation.parquet", sf_dir + "/regio*.parquet"], out
    )
    n_nation = spark.read.parquet(sf_dir + "/nation.parquet").count()
    n_region = spark.read.parquet(sf_dir + "/region.parquet").count()
    assert merged.count() == n_nation + n_region


def test_hadoop_sizing_fallback_matches_local_stat(spark, sf_dir, tmp_path):
    """merge_files sizes remote-scheme inputs (hdfs://, s3a://) through
    the Hadoop FileSystem API; exercise that code path via file: URIs
    (same FS implementation class) against the local stat baseline."""
    import os

    from tmp_parquet_merge_spark.sources.parquet_io import (
        _hadoop_input_bytes,
        _has_remote_scheme,
    )

    # scheme detection: remote schemes route to Hadoop, local don't
    assert _has_remote_scheme("hdfs://nn/data") and _has_remote_scheme(
        "s3a://bucket/key"
    )
    assert not _has_remote_scheme("file:/x") and not _has_remote_scheme("/x")

    f = f"{sf_dir}/nation.parquet"
    assert _hadoop_input_bytes(spark, "file:" + f) == os.path.getsize(f)
    # directory listing (recursive, *.parquet only)
    d = tmp_path / "ds"
    d.mkdir()
    import shutil

    shutil.copy(f, d / "a.parquet")
    shutil.copy(f, d / "b.parquet")
    (d / "junk.txt").write_text("not parquet")
    assert _hadoop_input_bytes(spark, "file:" + str(d)) == 2 * os.path.getsize(f)
    # glob
    assert _hadoop_input_bytes(
        spark, "file:" + str(d / "*.parquet")
    ) == 2 * os.path.getsize(f)


def test_merge_compaction_row_group_budget(spark, sf_dir, tmp_path):
    """Compaction contract: many small files merge into few files whose
    row groups respect the byte budget (footer-verified) and whose rows
    are conserved."""
    small, merged = str(tmp_path / "small"), str(tmp_path / "merged")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(32).write.parquet(small)
    n_small = len(glob.glob(small + "/*.parquet"))
    assert n_small >= 16  # genuinely scattered input
    parquet_io.merge_files(
        spark,
        [small],
        merged,
        target_file_size_bytes=32 * 1024 * 1024,
        block_size_bytes=1 * 1024 * 1024,
    )
    stats = parquet_io.metadata_stats(spark, merged).collect()
    assert sum(r.num_rows for r in stats) == li.count()
    assert len(stats) < n_small  # compacted
    # footer-verified row-group sizing: the 1 MiB block budget bounds
    # every group (2x slack: parquet rotates groups on the post-write
    # estimate, so a group can overshoot by up to one page run)
    assert all(
        r.max_row_group_bytes <= 2 * 1024 * 1024 for r in stats
    ), [r.max_row_group_bytes for r in stats]


def test_zorder_prunes_secondary_dimension(spark, sf_dir, tmp_path):
    """A layout sorted only by l_partkey cannot prune row groups for a
    l_suppkey predicate; the z-ordered layout must.  Candidate groups
    are counted from footer min/max (column_stats) for a point-ish
    range on the secondary dimension."""
    from pyspark.sql import functions as F

    from tmp_parquet_merge_spark.sources import parquet_io
    from tmp_parquet_merge_spark.sources.zorder import zorder_write

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )

    lin_path = str(tmp_path / "linear")
    (
        li.repartitionByRange(2, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.option("parquet.block.size", 8 * 1024)
        .parquet(lin_path)
    )
    z = zorder_write(
        li, ("l_partkey", "l_suppkey"), str(tmp_path / "zorder"),
        num_files=2, block_size_bytes=8 * 1024,
    )
    assert z.count() == li.count()

    lo, hi = 3, 4  # secondary-dimension range predicate

    def candidate_fraction(path):
        st = (
            parquet_io.column_stats(spark, path)
            .filter(F.col("column") == "l_suppkey")
            .select("min_value", "max_value")
            .collect()
        )
        n_cand = sum(
            1
            for r in st
            if int(r.min_value) <= hi and int(r.max_value) >= lo
        )
        return n_cand / len(st), len(st)

    f_lin, n_lin = candidate_fraction(lin_path)
    f_z, n_z = candidate_fraction(str(tmp_path / "zorder"))
    # enough row groups for pruning to be meaningful on both layouts
    assert n_lin >= 8 and n_z >= 8
    # the partkey-sorted layout is blind on suppkey (≈ all groups
    # match); z-order must skip a majority of groups
    assert f_lin > 0.9
    assert f_z < 0.5


def test_ignore_corrupt_files(spark, sf_dir, tmp_path):
    """Lake resilience: a garbage file inside the dataset directory is
    skipped under ignoreCorruptFiles instead of failing the scan."""
    import shutil

    import pytest
    from py4j.protocol import Py4JJavaError

    d = tmp_path / "ds"
    d.mkdir()
    shutil.copy(f"{sf_dir}/nation.parquet", d / "part-0.parquet")
    (d / "part-1.parquet").write_bytes(b"this is not parquet at all")
    good = spark.read.parquet(f"{sf_dir}/nation.parquet")

    with pytest.raises(Py4JJavaError):
        spark.read.parquet(str(d)).count()

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        back = spark.read.parquet(str(d))
        assert back.count() == good.count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")


def test_compact_incremental_conserves_rows_and_keeps_big_files(
    spark, sf_dir, tmp_path
):
    """Incremental compaction: only the small-file tail is rewritten;
    kept files are byte-identical; kept + compacted output conserve
    every row."""
    import os

    from pyspark.sql import functions as F

    from tmp_parquet_merge_spark.sources import parquet_io

    mixed = str(tmp_path / "mixed")
    out = str(tmp_path / "compacted")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parquet_io.write_parquet(li.repartition(3), mixed)
    parquet_io.write_parquet(
        li.limit(500).repartition(16), mixed, mode="append"
    )
    sizes = {
        f: os.path.getsize(f.removeprefix("file:"))
        for f in parquet_io._expand_parquet_paths(spark, mixed)
    }
    thr = int((min(sizes.values()) * max(sizes.values())) ** 0.5)
    before = {f: b for f, b in sizes.items()}
    manifest = parquet_io.compact_incremental(
        spark, mixed, out, small_file_bytes=thr,
        target_file_size_bytes=8 * thr, block_size_bytes=4 * thr,
    ).collect()
    kept = [r.file for r in manifest if r.action == "kept"]
    compacted = [r.file for r in manifest if r.action == "compacted"]
    written = [r.file for r in manifest if r.action == "written"]
    assert len(kept) == 3 and len(compacted) == 16 and written
    # kept files untouched on disk
    for f in kept:
        assert os.path.getsize(f.removeprefix("file:")) == before[f]
    # row conservation: kept ∪ compacted-output == original mixed table
    total_mixed = spark.read.parquet(mixed).count()
    n_kept = spark.read.parquet(*kept).count()
    n_out = spark.read.parquet(out).count()
    assert n_kept + n_out == total_mixed
    # the rewritten tail's content equals the small files' content
    small_rows = (
        spark.read.parquet(*compacted)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out_rows = (
        spark.read.parquet(out)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, small_rows)) == sorted(map(tuple, out_rows))


def test_kv_metadata_roundtrip(spark, tmp_path):
    """write_parquet(kv_metadata=...) stamps custom footer key-value
    pairs (r5 verdict #5 — the write side of parquet_reader.cc:46-47);
    the appended footer preserves row groups, data, and existing keys,
    and metadata_stats surfaces the engine-written keys."""
    import json

    import pyarrow.parquet as pq

    out = str(tmp_path / "kv")
    df = spark.range(1000).selectExpr("id", "id % 7 AS k")
    parquet_io.write_parquet(
        df,
        out,
        block_size_bytes=64 * 1024,
        kv_metadata={"engine.writer": "tmp-parquet-merge-spark",
                     "engine.tag": "r6"},
    )
    files = parquet_io._expand_parquet_paths(spark, out)
    assert files
    for f in files:
        md = pq.read_metadata(f.removeprefix("file:"))
        kv = {k.decode(): v.decode() for k, v in (md.metadata or {}).items()}
        assert kv["engine.writer"] == "tmp-parquet-merge-spark"
        assert kv["engine.tag"] == "r6"
        assert "org.apache.spark.sql.parquet.row.metadata" in kv  # kept
    # data unchanged through the appended footer, via Spark's reader
    assert spark.read.parquet(out).count() == 1000
    assert spark.read.parquet(out).agg(F.sum("id")).first()[0] == 499500
    # metadata_stats surfaces the engine-written keys
    rows = parquet_io.metadata_stats(spark, out).collect()
    for r in rows:
        kv = json.loads(r.key_value_metadata)
        assert kv["engine.tag"] == "r6"
    # re-stamping merges: new key added, old ones preserved, and the
    # file keeps exactly one readable (latest) footer
    parquet_io.attach_kv_metadata(spark, out, {"engine.pass": "2"})
    md = pq.read_metadata(files[0].removeprefix("file:"))
    kv = {k.decode(): v.decode() for k, v in (md.metadata or {}).items()}
    assert kv["engine.pass"] == "2" and kv["engine.tag"] == "r6"
    assert spark.read.parquet(out).count() == 1000


def test_q_metadata_stats_includes_engine_kv(spark):
    """The registered dump query must surface the engine-written kv
    key on exactly the stamped table, NULL everywhere else (the r8
    oracle-shaped output: engine_writer column)."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    rows = REGISTRY["q_metadata_stats"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_table = {r.table_name: r for r in rows}
    assert by_table["nation_kv"].engine_writer == "tmp-parquet-merge-spark"
    assert by_table["nation_kv"].num_rows == 25
    assert all(
        r.engine_writer is None for r in rows if r.table_name != "nation_kv"
    )


def test_kv_stamp_int96_file_and_mixed_refusal(spark, tmp_path):
    """Stamping must mirror the file's INT96 timestamp layout in the
    rebuilt footer (a plain rebuild declares INT64 and fails
    AppendRowGroups), and must refuse a file MIXING INT96 and INT64
    timestamps rather than emit a mismatched schema."""
    import pyarrow.parquet as pq
    import pytest
    from pyspark.sql import functions as F

    from tmp_parquet_merge_spark.sources import parquet_io

    # uniform INT96 file (LTZ under the INT96 session default)
    out = str(tmp_path / "int96kv")
    df = spark.range(20).select(
        F.col("id"), F.timestamp_seconds(F.col("id")).alias("ts")
    )
    parquet_io.write_parquet(df, out, int96_timestamps=True, num_files=1)
    assert parquet_io.attach_kv_metadata(spark, out, {"k": "v"}) == 1
    f = parquet_io._expand_parquet_paths(spark, out)[0]
    md = pq.ParquetFile(f).metadata
    assert (md.metadata or {}).get(b"k") == b"v"
    assert md.schema.column(1).physical_type == "INT96"
    assert spark.read.parquet(out).count() == 20

    # mixed INT96 + INT64 (LTZ + NTZ under the INT96 conf) -> refuse
    mixed = str(tmp_path / "mixedkv")
    dfm = df.withColumn("ts_ntz", F.col("ts").cast("timestamp_ntz"))
    parquet_io.write_parquet(dfm, mixed, int96_timestamps=True, num_files=1)
    with pytest.raises(Exception, match="mixes INT96"):
        parquet_io.attach_kv_metadata(spark, mixed, {"k": "v"})


def test_kv_stamp_repeated_latest_wins(spark, tmp_path):
    """Re-stamping appends another footer; readers follow the trailing
    footer, so the file stays readable and the newest value wins while
    untouched keys survive."""
    import pyarrow.parquet as pq

    from tmp_parquet_merge_spark.sources import parquet_io

    out = str(tmp_path / "restamp")
    parquet_io.write_parquet(
        spark.range(10).toDF("n"), out, num_files=1,
        kv_metadata={"a": "1", "b": "x"},
    )
    parquet_io.attach_kv_metadata(spark, out, {"a": "2"})
    f = parquet_io._expand_parquet_paths(spark, out)[0]
    kv = {
        k.decode(): v.decode()
        for k, v in (pq.ParquetFile(f).metadata.metadata or {}).items()
    }
    assert kv.get("a") == "2" and kv.get("b") == "x"
    assert spark.read.parquet(out).count() == 10
    import duckdb

    assert duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{f}')").fetchone()[0] == 10


def test_column_stats_query_canonicalizes_signed_zero(spark):
    """q_column_stats hash-failed in the r8 driver: lineitem's footer
    min for l_discount/l_tax is -0.0 while the data-side oracle min()
    is 0.0, and the driver hashes '-0.0' != '0.0'. The query now adds
    +0.0 to min_num/max_num, so no emitted numeric ever formats with a
    negative zero sign. Pinned at sf0.01 where the mismatch reproduced."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    rows = REGISTRY["q_column_stats"].build(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        for v in (r.min_num, r.max_num):
            if v is not None:
                assert f"{v:.6g}" != "-0", (r.column_name, v)
    # and the columns that triggered r8's failure are present + zero-min
    mins = {r.column_name: r.min_num for r in rows}
    assert mins["l_discount"] == 0.0 and str(mins["l_discount"])[0] != "-"


def test_schema_widening_read_and_mergeschema_rejection(spark, tmp_path):
    """read_parquet_widened (r9): int32+int64 generations widen to
    bigint losslessly (values beyond int32 range survive); plain
    mergeSchema is PINNED to reject the same pair (if a Spark upgrade
    starts widening natively, this probe flags the redundancy); a
    string-vs-int conflict raises loudly instead of coercing."""
    import pytest
    from pyspark.sql import functions as F
    from tmp_parquet_merge_spark.sources import parquet_io

    g1, g2, g3 = (str(tmp_path / n) for n in ("g1", "g2", "g3"))
    spark.range(3).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id").cast("double") / 4).cast("float").alias("m"),
    ).write.parquet(g1)
    spark.range(3).select(
        (F.col("id") + 4294967296).alias("id"),
        (F.col("id").cast("double") / 4).alias("m"),
    ).write.parquet(g2)
    out = parquet_io.read_parquet_widened(spark, g1, g2)
    assert dict(out.dtypes) == {"id": "bigint", "m": "double"}
    vals = sorted(r.id for r in out.collect())
    assert vals == [0, 1, 2, 4294967296, 4294967297, 4294967298]
    # float->double widening is value-preserving for float-exact values
    assert sorted(r.m for r in out.collect()) == [0.0, 0.0, 0.25, 0.25, 0.5, 0.5]
    # the native path must still be broken for this to earn its keep
    with pytest.raises(Exception, match="[Ff]ailed to merge"):
        spark.read.option("mergeSchema", "true").parquet(g1, g2).schema
    # non-widenable conflict: fail loudly, never coerce
    spark.range(3).select(F.col("id").cast("string").alias("id")).write.parquet(g3)
    with pytest.raises(ValueError, match="cannot widen"):
        parquet_io.read_parquet_widened(spark, g1, g3)
