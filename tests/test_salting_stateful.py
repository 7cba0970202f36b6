"""Salted-join equivalence and custom stateful streaming."""

import pandas as pd
from pyspark.sql import functions as F

from tmp_parquet_merge_spark.operators.relational import salted_join
from tmp_parquet_merge_spark.registry import events_table
from tmp_parquet_merge_spark.streaming import read_events_stream
from tmp_parquet_merge_spark.streaming.stateful import (
    user_profiles,
    user_profiles_batch,
)


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_custkey")
        .collect()
    )
    salted = (
        salted_join(o, c, "o_custkey", "c_custkey", salt=4)
        .select("o_orderkey", "c_custkey")
        .collect()
    )
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_salted_join_spreads_hot_key(spark):
    # one pathological key (all left rows identical) still joins right
    left = spark.range(1000).select(F.lit(7).alias("k"), F.col("id"))
    right = spark.createDataFrame([(7, "hot"), (8, "cold")], "k2: long, tag: string")
    out = salted_join(left, right, "k", "k2", salt=8)
    assert out.count() == 1000
    assert out.select("tag").distinct().collect()[0][0] == "hot"


def test_salted_join_left_outer_matches_plain(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k: long, lv: string"
    )
    right = spark.createDataFrame([(1, "x"), (1, "y")], "k2: long, rv: string")
    plain = sorted(
        map(tuple, left.join(right, left.k == right.k2, "left").collect())
    )
    salted = sorted(
        map(tuple, salted_join(left, right, "k", "k2", salt=4, how="left").collect())
    )
    assert salted == plain


def test_salted_join_rejects_right_and_full_outer(spark):
    import pytest

    left = spark.range(3).select(F.col("id").alias("k"))
    right = spark.range(3).select(F.col("id").alias("k2"))
    for how in ("right", "full_outer", "outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(left, right, "k", "k2", how=how)


def test_salted_join_salt_is_deterministic(spark):
    # retry-safety: the salt is a row hash, not rand() — two plans over
    # the same rows salt identically, so a task retry can't diverge
    left = spark.range(100).select(F.col("id").alias("k"), F.col("id"))
    a = salted_join(left, left.select(F.col("k").alias("k2")), "k", "k2").collect()
    b = salted_join(left, left.select(F.col("k").alias("k2")), "k", "k2").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    plan = salted_join(
        left, left.select(F.col("k").alias("k2")), "k", "k2"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "rand(" not in plan


def test_stateful_user_profiles_stream(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    q = (
        user_profiles(stream)
        .writeStream.format("memory")
        .queryName("t_profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink may hold one row per micro-batch per
    # user; the LAST update per user must equal the batch aggregate
    got = (
        spark.table("t_profiles")
        .groupBy("user_id")
        .agg(
            F.max_by("n_events", "n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    expect = (
        events_table(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # the stateful operator accumulates decimal(18,6)
            # micro-units (order-independent), so the comparison
            # against the same decimal sum is EXACT — no rtol
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got["n_events"] == expect["n_events"]).all()
    pd.testing.assert_series_equal(got["sum_value"], expect["sum_value"])


def test_stateful_batch_twin_final_state(spark, sf_dir):
    # the batch replay's per-user LAST row (the state after the final
    # event) must equal the per-user aggregate — the same final state
    # the streaming operator emits (linked to the stream by the test
    # above, which pins streaming final state == batch aggregate)
    e = events_table(spark, sf_dir)
    batch = user_profiles_batch(e)
    last = (
        batch.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
            F.max("last_ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    expect = (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (last["n_events"] == expect["n_events"]).all()
    pd.testing.assert_series_equal(last["sum_value"], expect["sum_value"])
    assert (last["last_ts"] == expect["last_ts"]).all()
