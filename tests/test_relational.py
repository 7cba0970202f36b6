"""Unit tests for the composed relational operators (as-of join, range
join, top-k) on small hand-checkable inputs."""

from pyspark.sql import functions as F

from tmp_parquet_merge_spark.operators.relational import (
    asof_join,
    grouped_top_k,
    range_join,
    top_k,
)
from tmp_parquet_merge_spark.sources import fixtures


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 25, "e2"), (2, 5, "e3")],
        "k: int, t: int, tag: string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 50, 500.0)],
        "k: int, rt: int, price: double",
    )
    out = {
        r.tag: r.price
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_values=["price"],
        ).collect()
    }
    # t=10 matches rt=10 (<= inclusive); t=25 matches rt=20; t=5 has no
    # earlier right row -> NULL
    assert out == {"e1": 100.0, "e2": 200.0, "e3": None}


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 25, "e2"), (2, 60, "e3")],
        "k: int, t: int, tag: string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 50, 500.0)],
        "k: int, rt: int, price: double",
    )
    out = {
        r.tag: r.price
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_values=["price"], direction="forward",
        ).collect()
    }
    # t=10 matches rt=10 (>= inclusive); t=25 has no later right row ->
    # NULL; t=60 is past rt=50 -> NULL
    assert out == {"e1": 100.0, "e2": None, "e3": None}


def test_asof_join_rejects_unknown_direction(spark):
    import pytest

    df = spark.createDataFrame([(1, 1)], "k: int, t: int")
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df.withColumnRenamed("t", "rt"), on="k",
                  left_time="t", right_time="rt", right_values=[],
                  direction="nearest")


def test_range_join_bands(spark):
    fact = spark.createDataFrame([(1, 5), (2, 10), (3, 99)], "id: int, v: int")
    bands = fixtures.size_bands_df(spark)
    got = {r.id: r.band for r in range_join(fact, bands, "v").collect()}
    assert got == {1: "small", 2: "medium", 3: "large"}  # lo <= v < hi


def test_top_k_deterministic(spark):
    df = spark.createDataFrame([(i % 3, i) for i in range(30)], "v: int, id: int")
    rows = top_k(df, [F.col("v").desc(), F.col("id")], 4).collect()
    assert [(r.v, r.id) for r in rows] == [(2, 2), (2, 5), (2, 8), (2, 11)]


def test_grouped_top_k(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 7)], "g: int, v: int"
    )
    rows = grouped_top_k(df, ["g"], [F.col("v").desc()], 2).collect()
    got = sorted((r.g, r.v) for r in rows)
    assert got == [(1, 20), (1, 30), (2, 7)]


def test_sketch_aggs_within_error_bounds(spark, sf_dir):
    """HLL++ (rsd=2%) and GK percentile sketches must land near their
    exact twins — the property that justifies the 100 TB substitution."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd"),
            F.percentile("l_extendedprice", 0.5).alias("p50"),
        )
        .collect()
    }
    sketch = {
        r.l_returnflag: r
        for r in REGISTRY["q_agg_sketch"].build(spark, sf_dir).collect()
    }
    for flag, ex in exact.items():
        sk = sketch[flag]
        assert abs(sk.approx_parts - ex.nd) / ex.nd < 0.1
        # GK sketch with accuracy 10000 is near-exact at this scale
        assert abs(sk.p50_sketch - ex.p50) / ex.p50 < 0.05
        # r8 quality columns: the emitted exact twin and rel_err must
        # EQUAL this independent recomputation (driver-visible truth)
        assert sk.exact_parts == ex.nd
        assert abs(
            sk.distinct_rel_err - abs(sk.approx_parts - ex.nd) / ex.nd
        ) < 1e-3
        assert sk.distinct_rel_err < 0.1


def test_upsert_semantics(spark):
    from tmp_parquet_merge_spark.operators.relational import upsert

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k: long, s: string, v: long"
    )
    updates = spark.createDataFrame(
        [(2, None, 99), (4, "d", 40)], "k: long, s: string, v: long"
    )
    got = {r.k: (r.s, r.v) for r in upsert(target, updates, ["k"]).collect()}
    assert got[1] == ("a", 10)          # untouched
    assert got[2] == (None, 99)         # update wins, NULL is a real value
    assert got[3] == ("c", 30)          # untouched
    assert got[4] == ("d", 40)          # insert
    assert len(got) == 4


def test_upsert_null_key_update_wins(spark):
    # the join is eqNullSafe, so a NULL-keyed update row matches a
    # NULL-keyed target row — and must WIN, not silently keep the
    # target's values (matched is a marker column, not key-nullness)
    from tmp_parquet_merge_spark.operators.relational import upsert

    target = spark.createDataFrame(
        [(None, "old", 1), (7, "x", 2)], "k: long, s: string, v: long"
    )
    updates = spark.createDataFrame(
        [(None, "new", 9)], "k: long, s: string, v: long"
    )
    got = {r.k: (r.s, r.v) for r in upsert(target, updates, ["k"]).collect()}
    assert got[None] == ("new", 9)
    assert got[7] == ("x", 2)
    assert len(got) == 2


def test_register_tables_sql_surface(spark, sf_dir):
    from tmp_parquet_merge_spark.registry import TABLES, register_tables

    register_tables(spark, sf_dir)
    for name in TABLES:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").count() >= 0
    joined = spark.sql(
        """SELECT r_name, count(*) AS n
           FROM region JOIN nation ON n_regionkey = r_regionkey
           GROUP BY r_name"""
    )
    assert joined.count() == 5
    # events view carries the normalized µs timestamp
    assert spark.sql("SELECT max(ts) FROM events").collect()[0][0] is not None


def test_compression_codecs_roundtrip(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    for codec in ("snappy", "zstd", "gzip", "lz4", "none"):
        p = str(tmp_path / f"c_{codec}")
        df.write.option("compression", codec).parquet(p)
        back = spark.read.parquet(p)
        assert back.exceptAll(df).count() == 0 and back.count() == df.count()


def test_asof_join_carries_matched_row_whole(spark):
    """A matched right row containing a REAL NULL value must come back
    as-is: a per-column ignorenulls carry would tear it, mixing the
    NULL column's value from an older right row (the struct carry
    pins all-or-nothing semantics)."""
    left = spark.createDataFrame([(1, 3)], "k: long, lt: long")
    right = spark.createDataFrame(
        [(1, 1, 10, "x"), (1, 2, None, "y")],
        "k: long, rt: long, val: long, tag: string",
    )
    row = asof_join(
        left, right, "k", "lt", "rt", ["val", "tag"]
    ).collect()[0]
    assert row.tag == "y" and row.val is None  # not the torn (10, 'y')


def test_asof_join_null_key_and_null_time_match_nothing(spark):
    """SQL ASOF equality semantics: a NULL join key or NULL left time
    matches no right row in EITHER direction (the forward sort would
    otherwise scan NULL-time left rows after every right row and hand
    them the earliest right row's values)."""
    left = spark.createDataFrame(
        [(None, 5), (1, None), (1, 5)], "k: long, lt: long"
    )
    right = spark.createDataFrame(
        [(1, 1, 10), (1, 9, 20), (None, 1, 77)],
        "k: long, rt: long, val: long",
    )
    for direction, want in (("backward", 10), ("forward", 20)):
        rows = {
            (r.k, r.lt): r.val
            for r in asof_join(
                left, right, "k", "lt", "rt", ["val"], direction=direction
            ).collect()
        }
        assert rows[(None, 5)] is None, direction
        assert rows[(1, None)] is None, direction
        # the valid row still matches normally in each direction
        assert rows[(1, 5)] == want, direction


def test_salted_join_spreads_identical_hot_rows(spark):
    """Byte-identical rows of a hot key (the pathological case salting
    exists for) must land on MORE than one salt value — a whole-row
    hash gives them all the same salt, i.e. one reducer."""
    from tmp_parquet_merge_spark.operators.relational import salted_join

    hot = spark.createDataFrame(
        [(1, "same") for _ in range(400)], "k: long, payload: string"
    ).repartition(4)
    dim = spark.createDataFrame([(1, "d")], "rk: long, dv: string")
    out = salted_join(hot, dim, "k", "rk", salt=8)
    assert out.count() == 400  # semantics match the plain join
    # inspect the salt distribution the operator would use
    salts = (
        hot.withColumn(
            "__salt",
            F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int"),
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts == 8  # all reducers participate


def test_salted_join_accepts_map_columns(spark):
    """xxhash64 rejects MapType; the row-position salt must not."""
    from tmp_parquet_merge_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [(1, {"a": 1})], "k: long, m: map<string,long>"
    )
    right = spark.createDataFrame([(1, "d")], "rk: long, dv: string")
    assert salted_join(left, right, "k", "rk", salt=4).count() == 1


def test_upsert_duplicate_update_keys_error_and_allow(spark):
    """Key-duplicate updates fan the output out (the table would grow
    every apply): the default errors like a table-format MERGE's
    'multiple source rows matched'; on_duplicate='allow' keeps the raw
    join semantics for callers who mean it."""
    import pytest

    from tmp_parquet_merge_spark.operators.relational import upsert

    target = spark.createDataFrame([(1, "a")], "k: long, s: string")
    dups = spark.createDataFrame(
        [(1, "u1"), (1, "u2")], "k: long, s: string"
    )
    with pytest.raises(Exception, match="multiple update rows"):
        upsert(target, dups, ["k"]).collect()
    assert upsert(target, dups, ["k"], on_duplicate="allow").count() == 2
    # unique-keyed updates are unaffected by the guard
    ok = spark.createDataFrame([(1, "u")], "k: long, s: string")
    assert upsert(target, ok, ["k"]).collect()[0].s == "u"


def test_funnel_empty_stages_raises(spark):
    import pytest

    from tmp_parquet_merge_spark.operators.relational import funnel

    df = spark.createDataFrame(
        [(1, "view", 1)], "user_id: long, event_type: string, ts: long"
    )
    with pytest.raises(ValueError, match="at least one stage"):
        funnel(df, [])


def test_key_skew_profile_names_top_share_by_n(spark):
    from tmp_parquet_merge_spark.operators.relational import (
        key_skew_profile,
    )

    df = spark.createDataFrame([(i % 3,) for i in range(30)], "k: long")
    assert "top10_share" in key_skew_profile(df, "k", "lbl").columns
    assert "top5_share" in key_skew_profile(df, "k", "lbl", top_n=5).columns


def test_join_asof_tolerance_gates_stale_matches(spark, sf_dir):
    """q_join_asof_tolerance (r9) == plain backward as-of (view before
    purchase, per user) with matches staler than 1 hour nulled out —
    exact, because under backward as-of any candidate other than the
    carried one is older still.  Both branches must fire on the
    bundled events."""
    import datetime

    from tmp_parquet_merge_spark.queries import REGISTRY
    from tmp_parquet_merge_spark.operators.relational import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("__rt"),
    )
    base = {
        r.event_id: (r.view_id, r.view_ts, r.ts)
        for r in asof_join(
            p, v, on="user_id", left_time="ts", right_time="__rt",
            right_values=["view_id", "view_ts"],
        ).select("event_id", "view_id", "view_ts", "ts").collect()
    }
    tol = {
        r.event_id: (r.view_id, r.view_ts)
        for r in REGISTRY["q_join_asof_tolerance"].build(spark, sf_dir).collect()
    }
    assert set(base) == set(tol)
    gated = kept = 0
    for eid, (vid, vts, ts) in base.items():
        if vts is not None and ts <= vts + datetime.timedelta(hours=1):
            assert tol[eid] == (vid, vts), eid
            kept += 1
        else:
            assert tol[eid] == (None, None), eid
            gated += 1
    assert kept and gated  # both behaviors exercised on the bundled data


def test_graph_degree_handshake_invariant(spark, sf_dir):
    """Σ degree·n_nodes = 2·|edges| (handshake lemma) and every degree
    is ≥ 1 (isolated nodes never enter the edge relation)."""
    from tmp_parquet_merge_spark.operators import graph
    from tmp_parquet_merge_spark.queries import REGISTRY

    rows = REGISTRY["q_graph_degree"].build(spark, sf_dir).collect()
    assert rows and all(r.degree >= 1 for r in rows)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_edges = (
        graph.cooccurrence_pairs(
            li.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey"
        )
        .select("a", "b")
        .distinct()
        .count()
    )
    assert sum(r.degree * r.n_nodes for r in rows) == 2 * n_edges


def test_ab_assign_deterministic_partition(spark, sf_dir):
    """The arms partition the user set deterministically: two builds
    agree exactly, and n_users sums to the distinct-user count."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    a = sorted(map(tuple, REGISTRY["q_ab_assign"].build(spark, sf_dir).collect()))
    b = sorted(map(tuple, REGISTRY["q_ab_assign"].build(spark, sf_dir).collect()))
    assert a == b
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r[1] for r in a) == ev.select("user_id").distinct().count()
    assert {r[0] for r in a} == {"control", "treatment"}


def test_anomaly_rate_warmup_and_zscore(spark, sf_dir):
    """Rate-spike detection: warm-up hours (< 12 trailing) are
    suppressed, z is NULL exactly when the trailing stddev is 0, and
    is_spike = 1 iff rate_z > 3."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    rows = REGISTRY["q_anomaly_rate"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.rate_z is None:
            assert r.is_spike == 0
        else:
            assert r.is_spike == (1 if r.rate_z > 3 else 0)


def test_rate_spikes_spine_closed_form(spark):
    """Closed-form fixture for the dense-spine rate detector: warm-up
    hours are suppressed, a completely EVENTLESS hour materializes as
    an n_events=0 row that fires the stall alarm, and a 100-event
    burst fires the spike alarm — the two failure modes the dense
    spine exists for (a ROWS frame over observed hours only would
    skip the stalled hour entirely)."""
    from datetime import datetime, timedelta

    from tmp_parquet_merge_spark.operators.relational import rate_spikes

    t0 = datetime(2025, 1, 1)
    rows = []
    eid = 0
    for h in range(36):
        if h == 30:
            continue  # the stall: no events at all this hour
        n = 100 if h == 35 else (9 if h % 2 == 0 else 11)
        for i in range(n):
            rows.append((eid, t0 + timedelta(hours=h, minutes=i % 60), "a"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id: long, ts: timestamp, event_type: string")
    out = {r.hour.hour + 24 * (r.hour.day - 1): r for r in rate_spikes(df).collect()}
    # warm-up: hours 0..11 suppressed (fewer than 12 trailing rows)
    assert min(out) == 12 and len(out) == 36 - 12
    stall = out[30]
    assert stall.n_events == 0 and stall.is_stall == 1 and stall.is_spike == 0
    spike = out[35]
    assert spike.n_events == 100 and spike.is_spike == 1 and spike.is_stall == 0
    for h, r in out.items():
        if h not in (30, 35):
            assert r.is_spike == 0 and r.is_stall == 0, (h, r)
    # r13 advisor: the baseline column is named from the trail
    # parameter — registered trail=24 keeps its historical name, a
    # 48-hour caller is not handed a column claiming a 24h window
    assert "mean_24h" in rate_spikes(df).columns
    assert "mean_48h" in rate_spikes(df, trail=48).columns


def test_asof_join_null_right_time_matches_nothing(spark):
    """r14 review: a right row with a NULL time must never be
    carried — backward's NULLS-FIRST sort placed it before every real
    row, so left rows with no true at-or-before match silently took
    its values."""
    from tmp_parquet_merge_spark.operators.relational import asof_join

    left = spark.createDataFrame([(1, 5)], "k: long, t: long")
    right = spark.createDataFrame(
        [(1, None, 99.0)], "k: long, rt: long, val: double"
    )
    for direction in ("backward", "forward"):
        out = asof_join(
            left, right, "k", "t", "rt", ["val"], direction=direction
        ).collect()
        assert len(out) == 1 and out[0].val is None, direction
    # and a NULL-time right row must not SHADOW an earlier real match
    right2 = spark.createDataFrame(
        [(1, None, 99.0), (1, 3, 7.0)], "k: long, rt: long, val: double"
    )
    out = asof_join(left, right2, "k", "t", "rt", ["val"]).collect()
    assert out[0].val == 7.0


def test_asof_join_right_time_ties_deterministic(spark):
    """r14 review: two right rows sharing (key, time) resolve to the
    greatest right_values tuple — a defined total order instead of
    shuffle-order nondeterminism.  Pinned across several partition
    layouts so a lucky ordering cannot pass."""
    from tmp_parquet_merge_spark.operators.relational import asof_join

    left = spark.createDataFrame([(1, 10)], "k: long, t: long")
    rows = [(1, 10, v) for v in (5.0, 1.0, 9.0, 3.0)]
    for nparts in (1, 2, 4):
        right = spark.createDataFrame(
            rows, "k: long, rt: long, val: double"
        ).repartition(nparts)
        out = asof_join(left, right, "k", "t", "rt", ["val"]).collect()
        assert out[0].val == 9.0, nparts


def test_upsert_missing_target_column_rejected(spark):
    """r14 review: a partial-schema updates frame silently NULLed the
    absent target columns on every matched row — now a loud
    ValueError."""
    import pytest as _pytest

    from tmp_parquet_merge_spark.operators.relational import upsert

    target = spark.createDataFrame([(1, "a", 2.0)], "k: long, name: string, bal: double")
    updates = spark.createDataFrame([(1, 3.0)], "k: long, bal: double")
    with _pytest.raises(ValueError, match="missing target columns"):
        upsert(target, updates, ["k"])


def test_upsert_keys_only_duplicate_guard_fires(spark):
    """r14 review: with a keys-only target the duplicate guard used to
    live in non-existent non-key columns and never evaluated; it is
    now fused into the key columns and must still raise."""
    import pytest as _pytest

    from tmp_parquet_merge_spark.operators.relational import upsert

    target = spark.createDataFrame([(1,)], "k: long")
    dup = spark.createDataFrame([(1,), (1,)], "k: long")
    with _pytest.raises(Exception, match="multiple update rows"):
        upsert(target, dup, ["k"]).collect()
    # non-duplicate keys-only apply still unions cleanly
    ok = spark.createDataFrame([(1,), (2,)], "k: long")
    got = sorted(r.k for r in upsert(target, ok, ["k"]).collect())
    assert got == [1, 2]


def test_rate_spikes_constant_baseline_flags(spark):
    """r14 review: the cron-heartbeat regime — a perfectly constant
    baseline makes sd = 0 and z undefined, but the alarms must still
    fire on any deviation (exact comparison against the constant);
    rate_z stays NULL there."""
    from datetime import datetime, timedelta

    from tmp_parquet_merge_spark.operators.relational import rate_spikes

    t0 = datetime(2025, 1, 1)
    rows = []
    eid = 0
    for h in range(40):
        if h == 30:
            continue  # total stall hour
        n = 50 if h == 38 else 5  # constant 5/hour heartbeat, one burst
        for i in range(n):
            rows.append((eid, t0 + timedelta(hours=h, minutes=i % 60), "hb"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id: long, ts: timestamp, event_type: string")
    out = {r.hour.hour + 24 * (r.hour.day - 1): r for r in rate_spikes(df).collect()}
    stall = out[30]
    assert stall.n_events == 0 and stall.is_stall == 1 and stall.rate_z is None
    spike = out[38]
    assert spike.n_events == 50 and spike.is_spike == 1
    quiet = [r for h, r in out.items() if h in (20, 25)]
    for r in quiet:
        assert r.is_spike == 0 and r.is_stall == 0 and r.rate_z is None


def test_rate_spikes_null_type_excluded(spark):
    """r14 review: NULL event_type rows are excluded up front — the
    spine equi-join can never match a NULL key, so keeping them
    produced all-zero corrupt series."""
    from datetime import datetime, timedelta

    from tmp_parquet_merge_spark.operators.relational import rate_spikes

    t0 = datetime(2025, 1, 1)
    rows = [
        (i, t0 + timedelta(hours=i % 20, minutes=i % 60), None)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "event_id: long, ts: timestamp, event_type: string")
    assert rate_spikes(df).count() == 0
