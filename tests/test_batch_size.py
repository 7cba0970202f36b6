"""Vectorized-reader batch-size knob parity.

The reference scan tool exposes ``--batch-size`` (default 256,
cpp/tools/parquet/parquet-scan.cc:35) and feeds it to every typed
``ReadBatch(batch_size, ...)`` loop (parquet-scan.cc:66).  Spark's
analog is ``spark.sql.parquet.columnarReaderBatchSize`` (default 4096)
on the vectorized reader.  These tests actually TOGGLE the knob —
scan results and pushed-down filter results must be invariant to the
batch size, at the reference's 256 as well as Spark's 4096 default
(SURVEY §2.A row "Batched column scan").
"""

import pytest

from tmp_parquet_merge_spark.registry import REGISTRY
import tmp_parquet_merge_spark.queries  # noqa: F401  (populate registry)

KNOB = "spark.sql.parquet.columnarReaderBatchSize"


@pytest.fixture
def batch_size_conf(spark):
    orig = spark.conf.get(KNOB)
    yield spark
    spark.conf.set(KNOB, orig)


def _counts(spark, sf_dir, name, sizes):
    out = []
    for n in sizes:
        spark.conf.set(KNOB, str(n))
        out.append(REGISTRY[name].build(spark, sf_dir).count())
    return out


def test_scan_count_invariant_to_batch_size(batch_size_conf, sf_dir):
    spark = batch_size_conf
    # reference default 256, a deliberately tiny 8 (forces many
    # per-row-group batches), and Spark's 4096 default
    a, b, c = _counts(spark, sf_dir, "q_scan_count", (256, 8, 4096))
    assert a == b == c > 0


def test_filter_pushdown_invariant_to_batch_size(batch_size_conf, sf_dir):
    spark = batch_size_conf
    a, b = _counts(spark, sf_dir, "q_filter_pushdown", (256, 4096))
    assert a == b > 0


def test_full_scan_values_invariant_to_batch_size(batch_size_conf, sf_dir):
    # value-level check on a small table: identical rows, not just
    # identical counts (mirrors the reference's value-verification
    # methodology, reader-writer.cc:206-399)
    spark = batch_size_conf
    spark.conf.set(KNOB, "256")
    small = sorted(
        spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    )
    spark.conf.set(KNOB, "7")
    tiny = sorted(
        spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    )
    assert small == tiny and len(small) == 25


def test_q_scan_batch_size_rows(spark, sf_dir):
    # the registered rows-only query: one row per knob setting, counts
    # and sums identical across 256 vs 4096
    rows = REGISTRY["q_scan_batch_size"].build(spark, sf_dir).collect()
    assert [r.batch_size for r in rows] == [256, 4096]
    assert rows[0].n_rows == rows[1].n_rows > 0
    assert rows[0].sum_qty == rows[1].sum_qty > 0
