"""Round-5 additions: LATERAL top-n, recursive CTE reachability,
shuffle-key skew profiling, int8 embedding quantization."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tmp_parquet_merge_spark.operators.relational import key_skew_profile
from tmp_parquet_merge_spark.registry import REGISTRY
import tmp_parquet_merge_spark.queries  # noqa: F401


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_lateral_topn_matches_window_spelling(spark, sf_dir):
    lat = REGISTRY["q_lateral_topn"].build(spark, sf_dir)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    win = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_acctbal")
    )
    assert sorted(map(tuple, lat.collect())) == sorted(
        map(tuple, win.collect())
    )


def test_lateral_topn_decorrelates(spark, sf_dir):
    # Catalyst must rewrite the correlated LATERAL into a partitioned
    # rank — a surviving per-outer-row nested loop would be quadratic
    p = _plan(REGISTRY["q_lateral_topn"].build(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    assert "Window" in p


def test_recursive_cte_matches_iterative_bfs(spark, sf_dir):
    rec = {
        r.seed: (r.n_reach, r.max_depth)
        for r in REGISTRY["q_recursive_cte"].build(spark, sf_dir).collect()
    }
    # independent spelling: same edge set, explicit 2-round frontier
    # expansion in DataFrame ops
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    p = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("a", "b")
    )
    edges = p.unionByName(p.select(F.col("b").alias("a"), F.col("a").alias("b")))
    seeds = [
        r.a
        for r in edges.groupBy("a")
        .agg(F.count(F.lit(1)).alias("d"))
        .orderBy(F.desc("d"), F.asc("a"))
        .limit(20)
        .collect()
    ]
    adj = {}
    for r in edges.collect():
        adj.setdefault(r.a, set()).add(r.b)
    for s in seeds:
        frontier, seen = {s}, {s}
        depth_reached = 0
        for depth in (1, 2):
            frontier = {
                b for a in frontier for b in adj.get(a, ())
            }
            if frontier - seen:
                depth_reached = depth
            seen |= frontier
        # max_depth counts path steps taken (UNION ALL keeps revisit
        # rows), so it is 2 whenever any edge leaves the frontier
        assert rec[s][0] == len(seen), s
    assert set(rec) == set(seeds)


def test_skew_profile_uniform_vs_hot_key(spark):
    uniform = spark.range(1000).select((F.col("id") % 100).alias("k"))
    prof_u = key_skew_profile(uniform, "k", "u").collect()[0]
    assert prof_u.n_rows == 1000 and prof_u.n_keys == 100
    assert abs(prof_u.skew_factor - 1.0) < 1e-6
    hot = spark.range(1000).select(
        F.when(F.col("id") < 901, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    prof_h = key_skew_profile(hot, "k", "h").collect()[0]
    assert prof_h.max_cnt == 901
    assert prof_h.top1_share == pytest.approx(0.901)
    assert prof_h.skew_factor > 80


def test_skew_profile_plan_has_no_global_sort_or_window(spark, sf_dir):
    df = REGISTRY["q_skew_diagnose"].build(spark, sf_dir)
    p = _plan(df)
    assert "Window" not in p
    # top-N must be TakeOrdered (distributed partial top-k), not a
    # global Sort feeding a Limit
    assert "TakeOrderedAndProject" in p


def test_embedding_quantize_bounds_and_reconstruction(spark, sf_dir):
    out = REGISTRY["q_embedding_quantize"].build(spark, sf_dir)
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    rows = out.collect()
    assert len(rows) == len(emb)
    for r in rows:
        qs = [int(v) for v in r.q8.split("|")]
        x = emb[r.vec_id]
        assert len(qs) == len(x)
        assert all(-127 <= q <= 127 for q in qs)
        # the output scale is rounded to 6 places for hash parity;
        # reconstruct with the exact scale the quantizer used
        exact = max(abs(float(v)) for v in x) / 127.0 or 1.0
        assert r.scale == pytest.approx(exact, abs=5e-7)
        for q, v in zip(qs, x):
            assert abs(q * exact - v) <= exact / 2 + 1e-9
        # rmse consistent with the per-element half-step bound
        assert 0 <= r.rmse <= exact / 2 + 1e-9


def test_quantize_int8_edge_cases(spark):
    """Edge corpus in ONE job: all-zero vector, constants, single
    element, extreme magnitudes, negatives — codes stay in [-127,127],
    reconstruction within half a step, zero vector maps to code 0."""
    from pyspark.sql import types as T

    from tmp_parquet_merge_spark.operators.similarity import quantize_int8

    vecs = [
        (0, [0.0, 0.0, 0.0]),
        (1, [5.0, 5.0, 5.0, 5.0]),
        (2, [1e30]),
        (3, [-1e-30, 1e-30]),
        (4, [-3.5, 7.25, -0.001, 127.0, -127.0]),
        (5, [float(i - 50) / 7.0 for i in range(101)]),
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(vecs, schema)
    rows = {r.vec_id: r for r in quantize_int8(df, "embedding", "vec_id").collect()}
    assert len(rows) == len(vecs)
    for vid, x in vecs:
        r = rows[vid]
        qs = [int(v) for v in r.q8.split("|")]
        assert len(qs) == len(x)
        assert all(-127 <= q <= 127 for q in qs)
        mx = max(abs(v) for v in x)
        exact = (mx / 127.0) if mx else 1.0
        for q, v in zip(qs, x):
            assert abs(q * exact - v) <= exact / 2 * (1 + 1e-12)
    assert rows[0].q8 == "0|0|0" and rows[0].rmse == 0.0
    assert rows[2].q8 == "127" and rows[2].rmse == 0.0
    # constant vector quantizes exactly
    assert rows[1].rmse == 0.0


def test_dq_audit_detects_injected_violations(spark, tmp_path):
    """The audit must actually count violations, not just emit zeros:
    a synthetic sf_dir with a dangling FK, a duplicate key, a negative
    price, and an empty document yields exactly those counts."""
    import pyspark.sql.functions as F  # noqa: F811

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "a"), (1, "dup"), (2, "b")], "c_custkey long, c_name string"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(10, 1, 5.0), (11, 99, -3.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(10, 1), (777, 1)], "l_orderkey long, l_partkey long"
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(1, "text"), (2, "")], "doc_id long, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {
        r.dq_check: r.n_violations
        for r in REGISTRY["q_dq_audit"].build(spark, sf).collect()
    }
    assert rows["orders.o_custkey->customer"] == 1  # o_custkey=99 dangling
    assert rows["lineitem.l_orderkey->orders"] == 1  # l_orderkey=777
    assert rows["customer.c_custkey unique"] == 1  # one surplus row
    assert rows["orders.o_totalprice >= 0"] == 1
    assert rows["documents.text non-empty"] == 1


def test_window_distinct_matches_manual_truncation(spark, sf_dir):
    out = {
        (r.w_start, r.event_type): (r.n_users, r.n_events)
        for r in REGISTRY["q_window_distinct"].build(spark, sf_dir).collect()
    }
    from tmp_parquet_merge_spark.registry import t as load

    e = load(spark, sf_dir, "events")
    manual = {
        (r.w, r.event_type): (r.u, r.n)
        for r in e.groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("w"),
            "event_type",
        )
        .agg(
            F.countDistinct("user_id").alias("u"), F.count(F.lit(1)).alias("n")
        )
        .collect()
    }
    assert out == manual
