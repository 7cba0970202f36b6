"""Structured Streaming: stream(availableNow) over the events parquet
must produce exactly the batch twin's result for tumbling, sliding and
session windows (the batch twins are oracle-checked separately)."""

import pytest

from tmp_parquet_merge_spark.registry import events_table
from tmp_parquet_merge_spark.streaming import (
    read_events_stream,
    run_to_memory_sink,
    sessionized,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return events_table(spark, sf_dir)


@pytest.fixture(scope="module")
def stream_events(spark, sf_dir):
    return read_events_stream(spark, sf_dir)


def _assert_stream_equals_batch(stream_out, batch_out):
    assert stream_out.exceptAll(batch_out).count() == 0
    assert batch_out.exceptAll(stream_out).count() == 0


def test_stream_is_streaming(stream_events):
    assert stream_events.isStreaming


def test_tumbling_stream_equals_batch(spark, stream_events, batch_events):
    out = run_to_memory_sink(tumbling_counts(stream_events), "t_tumble")
    _assert_stream_equals_batch(out, tumbling_counts(batch_events))


def test_sliding_stream_equals_batch(spark, stream_events, batch_events):
    out = run_to_memory_sink(sliding_counts(stream_events), "t_slide")
    _assert_stream_equals_batch(out, sliding_counts(batch_events))


def test_session_stream_equals_batch(spark, stream_events, batch_events):
    out = run_to_memory_sink(sessionized(stream_events), "t_session")
    _assert_stream_equals_batch(out, sessionized(batch_events))


def test_dedup_stream_equals_batch(spark, stream_events, batch_events):
    from tmp_parquet_merge_spark.streaming import dedup_events

    cols = ["event_id", "event_type", "value"]
    # a doubled feed (at-least-once delivery) dedupes back to one row
    # per event_id; append mode — dedup is not an aggregation
    doubled = stream_events.unionAll(stream_events)
    out = run_to_memory_sink(
        dedup_events(doubled).select(*cols), "t_dedup", output_mode="append"
    )
    _assert_stream_equals_batch(out, batch_events.select(*cols))
