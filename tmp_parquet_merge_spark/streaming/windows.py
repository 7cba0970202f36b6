"""Structured Streaming pipelines over the events table.

The reference has no streaming (SURVEY.md §0); this is the §2.E
extension, built the idiomatic way: ``readStream`` → event-time
windowed aggregation with watermarks → sink.  Each transformation is
written against a plain DataFrame so the SAME function serves both the
streaming pipeline and its batch twin — the batch twins are what the
DuckDB oracle checks (queries_streaming.py), and the streaming tests
assert stream(availableNow) ≡ batch on identical input.

Scale notes: windowed aggs shuffle on (window, key) with state kept in
the state store, bounded by the watermark; session windows use Spark's
native ``session_window`` state merging.  At 100 TB/day the knobs are
partition count on the source and watermark delay — the plan shape
here is already the right one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tmp_parquet_merge_spark.functions.deterministic import dsum

def _events_raw_schema(sf_dir: str) -> T.StructType:
    """Streaming needs a declared source schema; probe one parquet
    footer (driver-side, metadata only) so the declared ts type tracks
    the generator's physical type — TIMESTAMP(NANOS) testdata reads as
    int64 ns (``nanosAsLong``), TIMESTAMP(MICROS) as a timestamp."""
    import pyarrow.parquet as pq

    ts_arrow = pq.read_schema(
        os.path.join(sf_dir, "events.parquet")
    ).field("ts").type
    ts_spark: T.DataType = (
        T.LongType() if str(ts_arrow) == "timestamp[ns]" else T.TimestampType()
    )
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_spark, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


# Static int64-ns shape, for callers that synthesize ns-timestamp
# event files themselves (tests/test_streaming.py's late-data corpus).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # int64 epoch-ns
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _with_event_time(df: DataFrame) -> DataFrame:
    # µs truncation like registry.events_table, but kept as TIMESTAMP:
    # EventTimeWatermark rejects TIMESTAMP_NTZ.  The session timezone
    # is pinned to UTC, so values match the batch table's NTZ ones; the
    # window functions cast their OUTPUT timestamps to NTZ so stream
    # and batch twins still produce byte-identical schemas.
    if df.schema["ts"].dataType.simpleString() in ("bigint", "long"):
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def read_events_stream(
    spark: SparkSession, sf_dir: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events parquet (timestamp physical
    type probed from the footer, same convention as the batch reader)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # FileStreamSource needs a directory basePath; select the events
    # file(s) from the table directory with a glob filter.
    return _with_event_time(
        spark.readStream.schema(_events_raw_schema(sf_dir))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def tumbling_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts/sums.  On a stream the
    watermark bounds state and admits late data up to its delay; on a
    batch DataFrame withWatermark is a no-op, so this one body is both
    the pipeline and its oracle-checkable twin."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in window/slide
    overlapping windows."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("w_start"),
            "event_type",
            "n_events",
        )
    )


def sessionized(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other
    merge into one session (native session_window state merging)."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_events(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup (exactly-once repair for at-least-once
    sources): drop repeated event_ids with
    ``dropDuplicatesWithinWatermark`` — the dedup state store holds one
    key per event inside the watermark horizon and is evicted past it,
    so state is bounded by event-rate × delay, not stream lifetime.
    On a batch DataFrame the same body is a plain ``dropDuplicates``
    (the oracle-checkable twin)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    *,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream event-time interval join (view→purchase
    attribution): each purchase matches the same user's views from the
    preceding ``horizon``.  On streams both sides carry watermarks and
    the ts-range join condition, which together BOUND the join state:
    a buffered view is dropped once the purchase-side watermark passes
    its ts + horizon, so state is rate × (horizon + delay), not stream
    lifetime — the only safe shape for a stream-stream join at
    100 TB/day.  On batch DataFrames the same body is a plain interval
    self-join (the DuckDB-oracle twin, q_attribution).

    The lag rides as exact integer microseconds (unix_micros ≙ DuckDB
    epoch_us) — no seconds truncation, so both engines agree on
    sub-second timestamps."""
    if views.isStreaming:
        views = views.withWatermark("ts", watermark)
        purchases = purchases.withWatermark("ts", watermark)
    v, p = views.alias("v"), purchases.alias("p")
    cond = (
        (F.col("v.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") > F.col("v.ts"))
        & (F.col("p.ts") <= F.col("v.ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return v.join(p, cond, "inner").select(
        F.col("v.user_id").alias("user_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("p.event_id").alias("purchase_id"),
        # cast: the batch events table carries TIMESTAMP_NTZ (unix_micros
        # requires TIMESTAMP; the session tz is pinned UTC so the cast is
        # value-preserving); on the stream ts is already TIMESTAMP
        (
            F.unix_micros(F.col("p.ts").cast("timestamp"))
            - F.unix_micros(F.col("v.ts").cast("timestamp"))
        ).alias("lag_us"),
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, *, output_mode: str = "complete"
) -> DataFrame:
    """Drain a streaming aggregation with trigger(availableNow) into an
    in-memory table and return it as a DataFrame (test/driver harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def late_data_accounting(
    events: DataFrame,
    *,
    threshold: str = "10 minutes",
) -> DataFrame:
    """Watermark late-data accounting, batch-replayable: for each user
    stream (arrival order = ``event_id``, the monotone ingest id), an
    event is LATE when it arrives after the stream's event-time
    high-watermark has already advanced more than ``threshold`` past
    it — exactly the rows ``withWatermark(ts, threshold)`` would drop
    from a per-user stateful aggregation.  Emits the per-user audit
    (n_events, n_late, max_late_us): the dashboard a streaming
    pipeline uses to SIZE its watermark delay before the data is lost
    silently (Structured Streaming drops late rows without a counter;
    replaying this on the batch mirror is the published workaround).

    Deterministic and oracle-exact: lateness is integer microsecond
    arithmetic on ``unix_micros`` (≙ DuckDB ``epoch_us``), the
    running high-watermark is MAX over the PRECEDING frame only (an
    event is never late against itself), and the per-user frame means
    the only shuffle is one exchange on user_id — at 100 TB the state
    is one running max per user, the same keyed-state shape the
    streaming twin carries."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    win = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wm = F.max(us).over(win)
    # first event per user has an empty PRECEDING frame (wm NULL) and
    # is never late; coalesce, don't rely on greatest's NULL semantics
    # agreeing across engines
    late_us = F.greatest(F.coalesce(wm - us, F.lit(0)), F.lit(0))
    per_event = events.select(
        "user_id",
        "event_id",
        late_us.alias("late_us"),
    )
    return (
        per_event.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("late_us") > F.lit(int(_interval_us(threshold))), 1).otherwise(0)
            ).cast("long").alias("n_late"),
            F.max("late_us").alias("max_late_us"),
        )
    )


def _interval_us(threshold: str) -> int:
    """'10 minutes' → microseconds (the subset of interval units the
    late-data accountant accepts)."""
    units = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
    }
    parts = threshold.split()
    # isdigit (no sign handling): a negative watermark threshold is
    # nonsense — late_us >= 0 always, so `late_us > -N` would count
    # EVERY event late, silently
    if (
        len(parts) != 2
        or parts[1] not in units
        or not parts[0].isdigit()
        or int(parts[0]) < 1
    ):
        raise ValueError(
            f"unsupported watermark interval {threshold!r}: expected "
            f"'<positive int> <unit>' with unit one of {sorted(set(units))}"
        )
    n, unit = parts
    return int(n) * units[unit]
