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


def test_attribution_stream_equals_batch(spark, stream_events, batch_events):
    from pyspark.sql import functions as F

    from tmp_parquet_merge_spark.streaming.windows import attribution_join

    def split(e):
        return (
            e.filter(F.col("event_type") == "view"),
            e.filter(F.col("event_type") == "purchase"),
        )

    # stream-stream interval self-join (view→purchase attribution):
    # the streaming result must equal the batch twin exactly
    out = run_to_memory_sink(
        attribution_join(*split(stream_events)), "t_attr", output_mode="append"
    )
    _assert_stream_equals_batch(out, attribution_join(*split(batch_events)))


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics: an event older than the watermark when its
    micro-batch arrives is dropped from the windowed aggregation — the
    state-bounding contract every 100 TB/day stream depends on.

    Three single-file micro-batches (maxFilesPerTrigger=1; files must
    sit DIRECTLY in the watched dir — FileStreamSource does not recurse
    into ``df.write.parquet`` output dirs, hence pyarrow writes).  The
    operator-visible watermark lags the batch that advances it by one
    micro-batch (it is committed at batch end and applied from the NEXT
    batch), so the straggler arrives two batches after the advancing
    event."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tmp_parquet_merge_spark.streaming.windows import (
        EVENTS_RAW_SCHEMA,
        _with_event_time,
        tumbling_counts,
    )

    d = tmp_path / "late_events"
    d.mkdir()

    def mk(path, rows):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(cols[0], pa.int64()),
                    "ts": pa.array(cols[1], pa.int64()),
                    "user_id": pa.array(cols[2], pa.int64()),
                    "event_type": pa.array(cols[3], pa.string()),
                    "value": pa.array(cols[4], pa.float64()),
                    "props": pa.array(cols[5], pa.string()),
                }
            ),
            str(path),
        )

    ns = 1_000_000_000
    base = 1_700_000_000  # epoch seconds
    # batch 0: events at T+0h and T+3h → watermark advances to T+3h − 10m
    mk(d / "b0.parquet", [(1, base * ns, 1, "a", 1.0, "{}"),
                          (2, (base + 3 * 3600) * ns, 1, "a", 1.0, "{}")])
    time.sleep(1.1)  # FileStreamSource orders batches by mod time
    # batch 1: in-window filler; runs under the advanced watermark and
    # closes (evicts + emits) event 1's window at its end
    mk(d / "b1.parquet", [(3, (base + 3 * 3600 + 60) * ns, 1, "a", 1.0, "{}")])
    time.sleep(1.1)
    # batch 2: straggler from T+1min — 3h late against a 10-minute
    # watermark — must be dropped, not resurrect the closed window
    mk(d / "b2.parquet", [(4, (base + 60) * ns, 1, "a", 99.0, "{}")])

    stream = _with_event_time(
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d))
    )
    # append mode: only watermark-closed windows are emitted, and late
    # rows are dropped before entering state
    out = run_to_memory_sink(
        tumbling_counts(stream, window="1 hour", watermark="10 minutes"),
        "t_late",
        output_mode="append",
    ).collect()
    # the only closed window is event 1's (T+0h): had the straggler
    # (event 4) been admitted, its count would be 2 and its sum 100
    assert len(out) == 1
    assert out[0].n_events == 1 and out[0].sum_value == 1.0


def test_upsert_sink_stream_equals_batch(spark, sf_dir, tmp_path):
    """foreachBatch keyed-upsert sink: the target table after draining
    the stream (multi-batch availableNow) equals the batch
    last-writer-wins twin (q_stream_upsert)."""
    from tmp_parquet_merge_spark.streaming.sinks import (
        latest_per_user,
        run_upsert_sink,
    )
    from tmp_parquet_merge_spark.streaming.windows import read_events_stream

    target = str(tmp_path / "profiles")
    cur = run_upsert_sink(read_events_stream(spark, sf_dir), target)
    streamed = spark.read.parquet(cur)
    from tmp_parquet_merge_spark.registry import t as load

    batch = latest_per_user(load(spark, sf_dir, "events"))
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b


def test_upsert_sink_accumulates_across_batches(spark, tmp_path):
    """Counts accumulate and later batches overwrite earlier state —
    driven with two explicit micro-batch files."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tmp_parquet_merge_spark.streaming.sinks import run_upsert_sink
    from tmp_parquet_merge_spark.streaming.windows import (
        EVENTS_RAW_SCHEMA,
        _with_event_time,
    )

    d = tmp_path / "ev"
    d.mkdir()
    ns = 1_000_000_000
    base = 1_700_000_000

    def mk(path, rows):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(cols[0], pa.int64()),
                    "ts": pa.array(cols[1], pa.int64()),
                    "user_id": pa.array(cols[2], pa.int64()),
                    "event_type": pa.array(cols[3], pa.string()),
                    "value": pa.array(cols[4], pa.float64()),
                    "props": pa.array(cols[5], pa.string()),
                }
            ),
            str(path),
        )

    mk(d / "b0.parquet", [(1, base * ns, 7, "view", 1.0, "{}"),
                          (2, (base + 10) * ns, 7, "click", 2.0, "{}"),
                          (3, base * ns, 8, "view", 3.0, "{}")])
    time.sleep(1.1)
    mk(d / "b1.parquet", [(4, (base + 20) * ns, 7, "purchase", 9.0, "{}")])

    stream = _with_event_time(
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d))
    )
    cur = run_upsert_sink(stream, str(tmp_path / "tgt"))
    rows = {r.user_id: r for r in spark.read.parquet(cur).collect()}
    assert rows[7].last_event_type == "purchase"
    assert rows[7].last_value == 9.0
    assert rows[7].n_events == 3
    assert rows[8].last_event_type == "view"
    assert rows[8].n_events == 1


def test_upsert_sink_ts_tie_uses_real_event_id(spark, tmp_path):
    """r5 advisor: on an exact ts tie ACROSS micro-batches the higher
    event_id must win (as in one batch pass), even when the later
    micro-batch carries the LOWER id — the stored profile keeps
    last_event_id so the merge tie-break is exact."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tmp_parquet_merge_spark.streaming.sinks import run_upsert_sink
    from tmp_parquet_merge_spark.streaming.windows import (
        EVENTS_RAW_SCHEMA,
        _with_event_time,
    )

    d = tmp_path / "ev"
    d.mkdir()
    ns = 1_000_000_000
    base = 1_700_000_000

    def mk(path, rows):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(cols[0], pa.int64()),
                    "ts": pa.array(cols[1], pa.int64()),
                    "user_id": pa.array(cols[2], pa.int64()),
                    "event_type": pa.array(cols[3], pa.string()),
                    "value": pa.array(cols[4], pa.float64()),
                    "props": pa.array(cols[5], pa.string()),
                }
            ),
            str(path),
        )

    # batch 0 carries the HIGHER event_id at ts T; batch 1 the lower
    mk(d / "b0.parquet", [(9, base * ns, 7, "click", 2.0, "{}")])
    time.sleep(1.1)
    mk(d / "b1.parquet", [(4, base * ns, 7, "view", 1.0, "{}")])

    stream = _with_event_time(
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d))
    )
    cur = run_upsert_sink(stream, str(tmp_path / "tgt"))
    rows = {r.user_id: r for r in spark.read.parquet(cur).collect()}
    assert rows[7].last_event_id == 9
    assert rows[7].last_event_type == "click"
    assert rows[7].n_events == 2


def test_dedup_stream_with_rocksdb_state_store(spark, sf_dir):
    """The disk-backed RocksDB state store — the 100 TB/day state
    backend (bounded executor memory, state spills to local SSD) —
    produces the same result as the default HDFS-backed store."""
    key = "spark.sql.streaming.stateStore.providerClass"
    orig = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        from tmp_parquet_merge_spark.streaming.windows import (
            dedup_events,
            read_events_stream,
            run_to_memory_sink,
        )

        out = run_to_memory_sink(
            dedup_events(read_events_stream(spark, sf_dir)),
            "t_rocksdb_dedup",
            output_mode="append",
        )
        batch = spark.read.parquet(f"{sf_dir}/events.parquet")
        assert out.count() == batch.count()
    finally:
        spark.conf.set(key, orig)


def test_session_window_merges_exact_gap_tie(spark):
    """Two events exactly gap-duration apart form ONE Spark session
    (session_window coalesces touching windows — verified against
    Spark 4.1.2), so the gaps-and-islands oracle must split only on
    STRICTLY-greater gaps.  An `>=` oracle diverges on this input."""
    import datetime

    rows = [
        (1, 10, datetime.datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (2, 10, datetime.datetime(2024, 1, 1, 0, 30, 0), 2.0),
        # and one event strictly past the gap: a genuine new session
        (3, 10, datetime.datetime(2024, 1, 1, 1, 0, 0, 1), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = sessionized(df, gap="30 minutes").orderBy("session_start").collect()
    assert [r.n_events for r in out] == [2, 1]

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        "(10, TIMESTAMP '2024-01-01 00:00:00', 1.0), "
        "(10, TIMESTAMP '2024-01-01 00:30:00', 2.0), "
        "(10, TIMESTAMP '2024-01-01 01:00:00.000001', 4.0)"
        ") t(user_id, ts, value)"
    )
    n = con.execute(
        """
        WITH m AS (SELECT user_id, ts,
            CASE WHEN LAG(ts) OVER win IS NULL
                      OR ts - LAG(ts) OVER win > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts)),
        s AS (SELECT user_id, ts, SUM(new_s) OVER (
                  PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        SELECT COUNT(*) FROM (SELECT user_id, sid FROM s GROUP BY 1, 2)
        """
    ).fetchone()[0]
    assert n == 2  # strict-gap oracle agrees with Spark


def test_upsert_sink_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering the SAME batch id
    (driver death between swap and checkpoint write) must not
    double-count n_events — the _batch_id cursor committed inside the
    swapped directory dedupes the replay."""
    import datetime

    from tmp_parquet_merge_spark.streaming.sinks import _merge_batch

    target = str(tmp_path / "t")
    ts = datetime.datetime(2024, 1, 1)
    b0 = spark.createDataFrame(
        [(1, 10, "view", 1.0, ts)],
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp",
    )
    _merge_batch(spark, b0, target, 0)
    _merge_batch(spark, b0, target, 0)  # replay of batch 0
    cur = spark.read.parquet(str(tmp_path / "t" / "current"))
    assert cur.collect()[0].n_events == 1  # not 2
    # a NEW batch id still merges
    b1 = spark.createDataFrame(
        [(2, 10, "click", 2.0, ts + datetime.timedelta(minutes=1))],
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp",
    )
    _merge_batch(spark, b1, target, 1)
    row = spark.read.parquet(str(tmp_path / "t" / "current")).collect()[0]
    assert row.n_events == 2 and row.last_event_id == 2


def test_upsert_sink_keeps_null_user_across_merges(spark, tmp_path):
    """events.user_id is nullable: the NULL-user profile written by
    batch 0 must survive batch 1's merge (a plain equality join on
    user_id silently drops the NULL group — the sink joins
    null-safely, like operators/relational.py::upsert)."""
    import datetime

    from tmp_parquet_merge_spark.streaming.sinks import _merge_batch

    target = str(tmp_path / "t")
    ts = datetime.datetime(2024, 1, 1)
    b0 = spark.createDataFrame(
        [(1, None, "view", 1.0, ts), (2, 20, "view", 1.0, ts)],
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp",
    )
    _merge_batch(spark, b0, target, 0)
    b1 = spark.createDataFrame(
        [(3, 20, "click", 2.0, ts + datetime.timedelta(minutes=1))],
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp",
    )
    _merge_batch(spark, b1, target, 1)
    cur = spark.read.parquet(str(tmp_path / "t" / "current"))
    by_user = {r.user_id: r for r in cur.collect()}
    assert None in by_user and by_user[None].n_events == 1
    assert by_user[20].n_events == 2


def test_late_data_accounting_rules(spark):
    """Watermark late-data rules pinned on a constructed stream:
    an event is late only when the PRIOR high-watermark is more than
    the threshold past it (strictly greater — an exactly-at-threshold
    arrival survives, matching withWatermark's >= retention), the
    first arrival per user is never late, and the watermark never
    retreats."""
    import datetime

    from tmp_parquet_merge_spark.streaming.windows import late_data_accounting

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = [
        # user 1: in-order, never late
        (1, 1, t0), (2, 1, t0 + 5 * m), (3, 1, t0 + 9 * m),
        # user 2: event 12 arrives 10 min behind the watermark ->
        # EXACTLY at threshold, not late; event 13 arrives 11 min
        # behind -> late by 660s
        (11, 2, t0 + 20 * m), (12, 2, t0 + 10 * m), (13, 2, t0 + 9 * m),
        # user 3: single event, empty preceding frame
        (21, 3, t0),
    ]
    df = spark.createDataFrame(
        [(e, u, ts, "view", 1.0) for e, u, ts in rows],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    got = {
        r.user_id: (r.n_events, r.n_late, r.max_late_us)
        for r in late_data_accounting(df, threshold="10 minutes").collect()
    }
    assert got[1] == (3, 0, 0)
    assert got[2] == (3, 1, 11 * 60 * 1_000_000)
    assert got[3] == (1, 0, 0)
