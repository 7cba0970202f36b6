"""Physical-type-fidelity write path (SURVEY §7 deviations 1-3).

The reference declares its 8-type schema with physical/logical types
Spark's native writer cannot express (reader_writer.h SetupSchema,
lines 28-67): INT32/TIME_MILLIS, raw INT96, FIXED_LEN_BYTE_ARRAY(10),
and Repetition::REQUIRED on all but ba_field.  write_parquet_typed
reproduces that exact footer from a distributed Spark write;
write_parquet(int96_timestamps=True) covers the JVM-native INT96 case.
"""

import glob

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tmp_parquet_merge_spark.sources import fixtures, parquet_io

REQUIRED = (
    "boolean_field",
    "int32_field",
    "int96_field",
    "float_field",
    "double_field",
    "flba_field",
)


@pytest.fixture(scope="module")
def typed_out(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("typed") / "alltypes")
    df = fixtures.alltypes_df(spark, 500).coalesce(2)
    files = parquet_io.write_parquet_typed(
        df,
        out,
        flba_lengths={"flba_field": 10},
        time_millis_cols=["int32_field"],
        required_cols=REQUIRED,
        int96_timestamps=True,
    )
    return df, out, files


def test_typed_footer_matches_reference_schema(typed_out):
    """Physical + logical types and repetition match SetupSchema
    (reader_writer.h:28-67) field by field."""
    _, out, files = typed_out
    assert len(files) == 2  # one file per non-empty partition
    sch = pq.ParquetFile(files[0]).schema
    byname = {sch.column(i).name: sch.column(i) for i in range(len(sch))}
    assert byname["boolean_field"].physical_type == "BOOLEAN"
    assert byname["int32_field"].physical_type == "INT32"
    assert "Time" in str(byname["int32_field"].logical_type)
    assert "milliseconds" in str(byname["int32_field"].logical_type)
    assert byname["int96_field"].physical_type == "INT96"
    assert byname["float_field"].physical_type == "FLOAT"
    assert byname["double_field"].physical_type == "DOUBLE"
    assert byname["ba_field"].physical_type == "BYTE_ARRAY"
    assert byname["flba_field"].physical_type == "FIXED_LEN_BYTE_ARRAY"
    # FIXED_LENGTH = 10 declared in the footer (reader_writer.h:30)
    assert "fixed_len_byte_array(10)" in str(sch).lower()
    # Repetition::REQUIRED on all but ba_field / the repeated int64
    tree = str(sch)
    for line in tree.splitlines():
        for name in REQUIRED:
            if f" {name}" in line:
                assert "required" in line, line
        if " ba_field" in line:
            assert "optional" in line, line


def test_int64_field_list_encoding_delta_is_pinned(typed_out):
    """SURVEY §7: the ONE field whose schema-tree spelling cannot match
    the reference byte-for-byte.  reader_writer.h:45-46 declares
    ``repeated int64 int64_field`` — a bare 2-level repeated PRIMITIVE
    leaf (pre-LIST-annotation legacy parquet).  pyarrow's Arrow→Parquet
    conversion unconditionally wraps ArrayType in the 3-level LIST
    group (``optional group int64_field (List) { repeated group list {
    int64 element }}``); its only knob, use_compliant_nested_type,
    merely renames element→item, and Spark's writeLegacyFormat emits a
    3-level ``bag`` group — no available writer can emit the bare
    repeated leaf.  The other 7 reference fields byte-match
    (test_typed_footer_matches_reference_schema).  All parquet readers
    treat the two spellings as the same array<long> column
    (backward-compat rules, parquet-format LogicalTypes.md), which
    test_typed_roundtrip_spark and test_typed_file_cross_engine
    verify on values.  This test pins the exact delta so a future
    pyarrow that learns the legacy spelling fails it loudly (then
    switch and drop the SURVEY deviation)."""
    _, out, files = typed_out
    sch = pq.ParquetFile(files[0]).schema
    tree = str(sch)
    # current (deviating) spelling: 3-level LIST group, optional outer
    assert "optional group field_id=-1 int64_field (List)" in tree
    assert "repeated group" in tree
    # NOT the reference's bare repeated primitive
    assert "repeated int64 field_id=-1 int64_field" not in tree
    # and pyarrow still offers no bare-repeated spelling
    import pyarrow as pa

    probe = str(out) + "/__probe_legacy.parquet"
    t = pa.table(
        {"int64_field": pa.array([[1, 2]], pa.list_(pa.int64()))}
    )
    pq.write_table(t, probe, use_compliant_nested_type=False)
    legacy_tree = str(pq.ParquetFile(probe).schema)
    import os

    os.unlink(probe)
    assert "repeated int64" not in legacy_tree  # still a LIST group


def test_typed_roundtrip_spark(spark, typed_out):
    """Spark can't infer TIME(MILLIS) footers ([PARQUET_TYPE_ILLEGAL]);
    typed_read_schema maps TIME back to the ms-of-day IntegerType
    convention and the roundtrip is value-exact."""
    df, out, _ = typed_out
    back = parquet_io.read_parquet(
        spark, out, schema=parquet_io.typed_read_schema(spark, out)
    )
    assert back.schema["int32_field"].dataType.simpleString() == "int"
    assert back.count() == 500
    a = df.withColumn("int64_field", F.to_json("int64_field"))
    b = back.withColumn("int64_field", F.to_json("int64_field"))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_typed_file_cross_engine(typed_out):
    """Other engines see the declared logical types: DuckDB reads the
    TIME column as TIME and the FLBA column as BLOB."""
    _, out, _ = typed_out
    con = duckdb.connect()
    desc = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{out}/*.parquet')"
    ).fetchall()
    types = {row[0]: row[1] for row in desc}
    # pyarrow declares Time(isAdjustedToUTC=true) — the parquet-format
    # compatibility mapping of the legacy TIME_MILLIS converted type —
    # which DuckDB surfaces as TIME WITH TIME ZONE
    assert types["int32_field"].startswith("TIME")
    assert types["flba_field"] == "BLOB"
    assert types["int96_field"].startswith("TIMESTAMP")
    n, mn = con.execute(
        f"SELECT COUNT(*), MIN(int32_field) "
        f"FROM read_parquet('{out}/*.parquet')"
    ).fetchone()
    assert n == 500 and str(mn).startswith("00:00:00")


def test_flba_length_enforced(spark, tmp_path):
    """A value that isn't exactly the declared length fails the write
    (the reference's FLBA contract is a hard length, reader_writer.h:30)."""
    df = spark.range(2).select(
        F.unhex(F.lit("deadbeef")).alias("flba_field")  # 4 bytes, not 10
    )
    with pytest.raises(Exception, match="[Ww]idth|[Ff]ixed|4"):
        parquet_io.write_parquet_typed(
            df, str(tmp_path / "bad"), flba_lengths={"flba_field": 10}
        )


def test_native_int96_write(spark, tmp_path):
    """write_parquet(int96_timestamps=True): JVM-native distributed
    write emits physical INT96 (reader_writer.h:48-49) and reads back
    value-exact; the session conf is restored afterwards."""
    out = str(tmp_path / "int96")
    df = spark.range(100).select(
        F.col("id"), F.timestamp_seconds(F.col("id") * 3600).alias("ts")
    )
    # pin a non-INT96 session value (Spark's own default IS INT96 —
    # the flag exists to pin the choice against cluster defaults) and
    # check the write-scoped override is restored afterwards
    key = "spark.sql.parquet.outputTimestampType"
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        parquet_io.write_parquet(df, out, int96_timestamps=True, num_files=1)
        assert spark.conf.get(key) == "TIMESTAMP_MICROS"
    finally:
        spark.conf.set(key, "INT96")
    f = glob.glob(out + "/*.parquet")[0]
    md = pq.ParquetFile(f).metadata.row_group(0)
    phys = {
        md.column(i).path_in_schema: md.column(i).physical_type
        for i in range(md.num_columns)
    }
    assert phys["ts"] == "INT96"
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert df.exceptAll(back).isEmpty() and back.exceptAll(df).isEmpty()


def test_typed_row_group_rows(spark, tmp_path):
    """row_group_rows bounds row-group size within each arrow batch —
    the rows-per-group analog of the reference's fixed-row
    AppendRowGroup sizing (reader-writer.cc:45,73-74)."""
    out = str(tmp_path / "rg")
    df = fixtures.alltypes_df(spark, 1000).coalesce(1)
    files = parquet_io.write_parquet_typed(df, out, row_group_rows=100)
    md = pq.ParquetFile(files[0]).metadata
    assert md.num_rows == 1000
    assert md.num_row_groups >= 10
    assert max(
        md.row_group(i).num_rows for i in range(md.num_row_groups)
    ) <= 100


def test_typed_writer_multi_batch_partitions(spark, tmp_path):
    """A partition whose Arrow stream arrives as MANY small batches
    (the 100 TB shape: maxRecordsPerBatch ≪ partition rows) must still
    produce ONE file per partition with every batch appended."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "50")
    try:
        df = fixtures.alltypes_df(spark, 1000).coalesce(2)
        out = str(tmp_path / "mb")
        files = parquet_io.write_parquet_typed(
            df,
            out,
            flba_lengths={"flba_field": 10},
            time_millis_cols=["int32_field"],
            int96_timestamps=True,
        )
        assert len(files) == 2
        assert sum(pq.ParquetFile(f).metadata.num_rows for f in files) == 1000
        back = parquet_io.read_parquet(
            spark, out, schema=parquet_io.typed_read_schema(spark, out)
        )
        assert back.select("int32_field").distinct().count() == 1000
    finally:
        spark.conf.set(key, prev)


def test_typed_writer_property_roundtrip(spark, tmp_path):
    """Property-style sweep: several FLBA lengths × partition counts
    roundtrip value-exact with the declared length in every footer."""
    for length, parts in [(1, 1), (4, 3), (16, 2)]:
        df = (
            spark.range(120)
            .select(
                F.col("id"),
                F.unhex(
                    F.repeat(
                        F.lpad(F.hex((F.col("id") % 256).cast("int")), 2, "0"),
                        length,
                    )
                ).alias("fb"),
            )
            .repartition(parts)
        )
        out = str(tmp_path / f"p{length}_{parts}")
        files = parquet_io.write_parquet_typed(
            df, out, flba_lengths={"fb": length}
        )
        assert len(files) == parts
        for f in files:
            sch = str(pq.ParquetFile(f).schema).lower()
            assert f"fixed_len_byte_array({length})" in sch
        back = parquet_io.read_parquet(
            spark, out, schema=parquet_io.typed_read_schema(spark, out)
        )
        assert back.filter(F.length("fb") != length).count() == 0
        assert back.count() == 120
        assert df.exceptAll(back).isEmpty() and back.exceptAll(df).isEmpty()


def test_typed_writer_overwrite_modes(spark, tmp_path):
    """mode='overwrite' (the default, matching write_parquet) replaces
    prior files instead of silently accumulating; 'append' keeps them;
    'error' refuses a non-empty target."""
    df = fixtures.alltypes_df(spark, 100).coalesce(1)
    out = str(tmp_path / "modes")
    parquet_io.write_parquet_typed(df, out)
    parquet_io.write_parquet_typed(df, out)  # default overwrite
    back = parquet_io.read_parquet(
        spark, out, schema=parquet_io.typed_read_schema(spark, out)
    )
    assert back.count() == 100
    parquet_io.write_parquet_typed(df, out, mode="append")
    assert parquet_io.read_parquet(
        spark, out, schema=parquet_io.typed_read_schema(spark, out)
    ).count() == 200
    with pytest.raises(FileExistsError):
        parquet_io.write_parquet_typed(df, out, mode="error")


def test_typed_writer_commit_leaves_no_inprogress(spark, tmp_path):
    """Task commit is write-to-dot-name + rename-on-close: a completed
    write leaves only part-*.parquet, and a mid-write failure leaves
    only the dot-prefixed temp that directory readers ignore."""
    import os

    df = fixtures.alltypes_df(spark, 100).coalesce(2)
    out = str(tmp_path / "commit")
    files = parquet_io.write_parquet_typed(df, out)
    names = sorted(os.listdir(out))
    assert len(files) == 2 and all(n.endswith(".parquet") for n in names)
    # failure path: the FLBA length violation aborts the task after the
    # writer opened its temp file — no final-named file may surface
    bad = spark.range(10).select(
        F.unhex(F.lit("ff")).alias("flba_field")
    ).coalesce(1)
    outb = str(tmp_path / "aborted")
    with pytest.raises(Exception):
        parquet_io.write_parquet_typed(
            bad, outb, flba_lengths={"flba_field": 10}
        )
    assert [n for n in os.listdir(outb) if n.endswith(".parquet")] == []


def test_time_millis_range_enforced(spark, tmp_path):
    """ms-of-day outside [0, 86_399_999] fails the write — same hard
    contract as the FLBA length (invalid TIME values must not reach a
    footer other engines trust)."""
    df = spark.range(3).select(
        (F.col("id") + F.lit(86_400_000)).cast("int").alias("tm")
    )
    with pytest.raises(Exception, match="ms-of-day"):
        parquet_io.write_parquet_typed(
            df, str(tmp_path / "badtime"), time_millis_cols=["tm"]
        )


def test_typed_read_schema_empty_dataset_raises(spark, tmp_path):
    """An empty input writes no files; typed_read_schema reports that
    instead of an IndexError."""
    df = fixtures.alltypes_df(spark, 10).filter(F.lit(False)).coalesce(1)
    out = str(tmp_path / "empty")
    assert parquet_io.write_parquet_typed(df, out) == []
    with pytest.raises(ValueError, match="no parquet files"):
        parquet_io.typed_read_schema(spark, out)


def test_typed_writer_byte_budget_row_groups(spark, tmp_path):
    """Without row_group_rows, small arrow batches are BUFFERED into
    row groups rotated at block_size_bytes (reader-writer2.cc:46) —
    not one row group per batch."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "100")
    try:
        df = fixtures.alltypes_df(spark, 2000).coalesce(1)
        out = str(tmp_path / "budget")
        # budget far above the data size -> all 20 batches coalesce
        # into ONE row group
        files = parquet_io.write_parquet_typed(
            df, out, block_size_bytes=64 * 1024 * 1024
        )
        md = pq.ParquetFile(files[0]).metadata
        assert md.num_rows == 2000 and md.num_row_groups == 1
        # a budget below one batch's size flushes every batch: the
        # rotation point tracks the budget, not a fixed per-batch rule
        files = parquet_io.write_parquet_typed(
            df, str(tmp_path / "tiny"), block_size_bytes=1
        )
        md = pq.ParquetFile(files[0]).metadata
        assert md.num_rows == 2000 and md.num_row_groups == 20
    finally:
        spark.conf.set(key, prev)
