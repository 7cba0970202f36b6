"""Golden roundtrip tests — the reference's own correctness methodology
(SURVEY §5): write deterministic patterns, read back, assert equality.
Mirrors reader-writer.cc:206-399 value asserts + structural asserts."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tmp_parquet_merge_spark.sources import fixtures, parquet_io


@pytest.fixture(scope="module")
def roundtrip(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rt") / "alltypes")
    df = fixtures.alltypes_df(spark, 500)
    parquet_io.write_parquet(
        df, out, block_size_bytes=16 * 1024 * 1024, compression="snappy", num_files=1
    )
    return df, spark.read.parquet(out), out


def test_roundtrip_exact(spark, roundtrip):
    df, back, _ = roundtrip
    assert back.count() == 500
    assert df.exceptAll(back).isEmpty() and back.exceptAll(df).isEmpty()


def test_roundtrip_schema(roundtrip):
    df, back, _ = roundtrip
    assert [f.name for f in back.schema.fields] == [f.name for f in df.schema.fields]
    assert len(back.schema.fields) == 8  # reader-writer.cc:193 num_columns==8


def test_null_pattern(roundtrip):
    """ba_field NULL on every odd row (reader-writer.cc:147-150)."""
    _, back, _ = roundtrip
    odd_nulls = back.filter((F.col("int32_field") % 2 == 1)).filter(
        F.col("ba_field").isNotNull()
    )
    even_nulls = back.filter((F.col("int32_field") % 2 == 0)).filter(
        F.col("ba_field").isNull()
    )
    assert odd_nulls.count() == 0 and even_nulls.count() == 0


def test_repeated_field(roundtrip):
    """int64_field = [2i, 2i+1] (reader-writer2.cc:115-121)."""
    _, back, _ = roundtrip
    bad = back.filter(
        (F.col("int64_field")[0] != 2 * F.col("int32_field"))
        | (F.col("int64_field")[1] != 2 * F.col("int32_field") + 1)
        | (F.size("int64_field") != 2)
    )
    assert bad.count() == 0


def test_fixed_len_binary(roundtrip):
    """flba_field is exactly 10 bytes (reader_writer.h:30,63-65)."""
    _, back, _ = roundtrip
    assert back.filter(F.length("flba_field") != 10).count() == 0


def test_row_group_byte_budget(spark, tmp_path):
    """Row groups stay under the 16 MiB budget (reader-writer2.cc:222)
    at the reference's 2.5M-row stress scale (reader-writer2.cc:45)."""
    out = str(tmp_path / "big")
    df = fixtures.alltypes_df(spark, 250_000)  # scaled-down CI variant
    parquet_io.write_parquet(
        df, out, block_size_bytes=16 * 1024 * 1024, num_files=1
    )
    import glob

    files = glob.glob(out + "/*.parquet")
    assert files
    md = pq.ParquetFile(files[0]).metadata
    assert md.num_rows == 250_000
    for i in range(md.num_row_groups):
        assert md.row_group(i).total_byte_size < 32 * 1024 * 1024


def test_compression_is_snappy(roundtrip):
    _, _, out = roundtrip
    import glob

    f = glob.glob(out + "/*.parquet")[0]
    md = pq.ParquetFile(f).metadata
    assert md.row_group(0).column(0).compression == "SNAPPY"


@pytest.mark.skipif(
    not __import__("os").environ.get("TPMS_STRESS"),
    reason="2.5M-row stress roundtrip (reader-writer2.cc:45); set TPMS_STRESS=1",
)
def test_stress_roundtrip_2_5m(spark, tmp_path):
    """The reference's full stress scale: 2,500,000 rows × 8 columns,
    16 MiB row groups, write → read → exact equality + count
    conservation across row groups (reader-writer2.cc:45-46,214-420)."""
    out = str(tmp_path / "stress")
    df = fixtures.alltypes_df(spark, 2_500_000)
    parquet_io.write_parquet(df, out, block_size_bytes=16 * 1024 * 1024)
    back = spark.read.parquet(out)
    assert back.count() == 2_500_000
    assert df.exceptAll(back).isEmpty() and back.exceptAll(df).isEmpty()


def test_events_loader_handles_both_timestamp_physical_types(spark, tmp_path):
    """The driver's generator has shipped events.ts as TIMESTAMP(NANOS)
    (rounds 1-2) and TIMESTAMP(MICROS) (round 3) — registry.events_table
    must normalize both to the same TIMESTAMP_NTZ µs column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tmp_parquet_merge_spark.registry import events_table

    base = 1_700_000_000
    rows = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 7], pa.int64()),
        "event_type": pa.array(["view", "click"], pa.string()),
        "value": pa.array([1.0, 2.0], pa.float64()),
        "props": pa.array(["{}", "{}"], pa.string()),
    }
    expect = [(base * 1_000_000 + 123456), (base + 5) * 1_000_000]
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        ts = pa.array([v * (1000 if unit == "ns" else 1) for v in expect],
                      pa.timestamp(unit))
        pq.write_table(pa.table({**rows, "ts": ts}), str(d / "events.parquet"))
        df = events_table(spark, str(d))
        assert df.schema["ts"].dataType.simpleString() == "timestamp_ntz"
        got = sorted(
            int(r.ts.timestamp() * 1_000_000) for r in df.select("ts").collect()
        )
        assert got == sorted(expect), unit
