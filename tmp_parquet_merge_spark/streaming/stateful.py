"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed aggregations (streaming/windows.py) cover
time-bucketed state; this module is the arbitrary-state path — the
Spark-idiomatic replacement for a hand-written stateful operator in a
native engine.  Demonstrated operator: per-user running activity
profile (event count, value sum, last-seen timestamp) maintained
across micro-batches with a processing-time timeout.

Scale notes: state lives in the state store keyed by user (RocksDB
provider on clusters), partitioned by the groupBy key — one shuffle
per micro-batch, state size O(active users), bounded by the timeout.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_ts timestamp"
STATE_SCHEMA = "n long, s long, last long"


def _micros(values) -> int:
    """Exact sum of ``values`` in decimal(18,6) micro-units.

    The batch twin sums ``CAST(value AS DECIMAL(18,6))`` (the repo's
    deterministic-sum convention), which is order-independent integer
    arithmetic.  A plain float accumulator here depends on batch
    boundaries and addition order, so the streaming final state would
    only APPROXIMATELY equal the batch replay.  Mirroring Spark's
    double→decimal cast (BigDecimal.valueOf = shortest decimal repr,
    then HALF_UP to 6 dp) per value and summing ints makes the
    equality exact."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000001")
    return sum(
        int(Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP).scaleb(6))
        for v in values
        if not pd.isna(v)
    )


def _make_update(timeout_ms: int | None):
    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        # last=None, not 0: a 0 sentinel would report 1970-01-01 for
        # users whose events are all pre-epoch (negative epoch-ns)
        n, s, last = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            n += len(pdf)
            s += _micros(pdf["value"])
            m = int(pdf["ts"].astype("int64").max())
            last = m if last is None else max(last, m)
        state.update((n, s, last))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s / 1_000_000],
                "last_ts": [pd.Timestamp(last)],
            }
        )

    return update


def user_profiles(events: DataFrame, *, timeout_ms: int | None = None) -> DataFrame:
    """Running per-user profiles over a stream of events (ts, user_id,
    value).  Each micro-batch emits the updated profile of every user
    it touched.

    ``timeout_ms`` evicts idle users' state (the unbounded-key
    protection on a long-running cluster job).  Leave None for finite
    replays: with a timeout configured, trigger(availableNow) never
    terminates — Spark keeps scheduling state-cleanup micro-batches
    ("no new data but cleaning up state") until the timeout fires.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def user_profiles_batch(events: DataFrame) -> DataFrame:
    """The state machine of :func:`user_profiles` replayed in batch:
    one row per event carrying the state AFTER that event folds in —
    running count, running sum, running last-seen — via window
    functions over (ts, event_id) order.  The per-user LAST row equals
    the stateful operator's final emitted state on the same finite
    input EXACTLY — both sides accumulate value in decimal(18,6)
    units, so the equality is order- and batch-boundary-independent
    (asserted without tolerance in tests/test_salting_stateful.py) —
    which gives the arbitrary-state path a DuckDB-oracle-checkable
    twin.

    One shuffle on user_id, one sorted pass per partition — the same
    partitioning the state store uses, so the plan scales exactly like
    the streaming job's shuffle."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_value"),
        F.max("ts").over(w).alias("last_ts"),
    )
