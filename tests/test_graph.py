"""PageRank vs a dense NumPy reference: the distributed join-aggregate
loop must reproduce the textbook power iteration, including dangling-
node mass redistribution and early convergence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tmp_parquet_merge_spark.operators import graph


def _numpy_pagerank(n, edge_list, damping=0.85, iters=10, tol=1e-6):
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    it = 0
    for it in range(1, iters + 1):
        dangling = r[out_deg == 0].sum()
        inflow = np.zeros(n)
        for s, d in edge_list:
            inflow[d] += r[s] / out_deg[s]
        new_r = (1 - damping) / n + damping * (dangling / n + inflow)
        delta = np.abs(new_r - r).sum()
        r = new_r
        if delta < tol:
            break
    return r, it


@pytest.fixture(scope="module")
def chain_graph(spark):
    # 0→1→2→3 plus a 4→0 back-edge and node 3 dangling
    edges = [(0, 1), (1, 2), (2, 3), (4, 0)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return df, edges, 5


def test_pagerank_matches_numpy(spark, chain_graph):
    df, edges, n = chain_graph
    got = {
        r.node: (r.rank, r.n_iter)
        for r in graph.pagerank(df, damping=0.85, max_iter=10).collect()
    }
    ref, ref_it = _numpy_pagerank(n, edges, damping=0.85, iters=10)
    assert set(got) == set(range(n))
    for node, (rank, n_iter) in got.items():
        assert rank == pytest.approx(ref[node], abs=1e-6)
        assert n_iter == ref_it
    # ranks form a probability distribution
    assert sum(r for r, _ in got.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_converges_early_on_symmetric_clique(spark):
    # K3 symmetrized: uniform fixpoint from the uniform init — the L1
    # delta is 0 after round 1 and iteration must stop there
    edges = [(a, b) for a in range(3) for b in range(3) if a != b]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    out = graph.pagerank(df, max_iter=10).collect()
    # output ranks are rounded to 6 decimals
    assert all(r.rank == pytest.approx(1 / 3, abs=5e-7) for r in out)
    assert all(r.n_iter == 1 for r in out)


def test_pagerank_partition_invariant(spark, chain_graph):
    # the pinned node-hash layout (num_partitions) is a physical knob:
    # ranks, iteration counts, and early-exit behavior must be
    # bit-identical to the default layout for any partition count
    df, _, _ = chain_graph
    base = {
        r.node: (r.rank, r.n_iter)
        for r in graph.pagerank(df, damping=0.85, max_iter=10).collect()
    }
    for p in (1, 3):
        got = {
            r.node: (r.rank, r.n_iter)
            for r in graph.pagerank(
                df, damping=0.85, max_iter=10, num_partitions=p
            ).collect()
        }
        assert got == base, f"num_partitions={p} changed results"


def test_symmetrize_doubles_edges(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "a: long, b: long")
    got = {(r.src, r.dst) for r in graph.symmetrize(df, "a", "b").collect()}
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}


def test_cooccurrence_pairs_equals_self_join(spark):
    # the array-local expansion must emit exactly the rows of the
    # classic DISTINCT self-join on the group key (one row per group
    # per a<b pair), including within-group duplicate collapse
    rows = [
        (1, 10), (1, 20), (1, 30), (1, 20),  # dup item in group 1
        (2, 10), (2, 20),
        (3, 5),                               # singleton: no pairs
        (4, 10), (4, 20),                     # repeats pair (10,20)
    ]
    df = spark.createDataFrame(rows, "g: long, item: long")
    got = sorted(
        (r.a, r.b)
        for r in graph.cooccurrence_pairs(df, "g", "item").collect()
    )
    lp = df.distinct().alias("x")
    from pyspark.sql import functions as FF

    ref = sorted(
        (r.a, r.b)
        for r in lp.join(
            df.distinct().alias("y"),
            (FF.col("x.g") == FF.col("y.g"))
            & (FF.col("x.item") < FF.col("y.item")),
        )
        .select(
            FF.col("x.item").alias("a"), FF.col("y.item").alias("b")
        )
        .collect()
    )
    assert got == ref
    assert got.count((10, 20)) == 3  # group multiplicity preserved


def test_cooccurrence_oversized_group_raises(spark):
    # r5 verdict #3: the bounded-group contract is ENFORCED — a group
    # over max_group_size fails the job with a descriptive error
    # instead of silently buffering an unbounded array
    rows = [(1, i) for i in range(50)] + [(2, 1), (2, 2)]
    df = spark.createDataFrame(rows, "g: long, item: long")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException, Exception)) as ei:
        graph.cooccurrence_pairs(df, "g", "item", max_group_size=10).collect()
    assert "max_group_size" in str(ei.value)


def test_cooccurrence_selfjoin_fallback_matches_array_path(spark):
    # oversized groups routed through the streaming self-join must
    # produce exactly the same multiset of pairs as the (unguarded)
    # array expansion
    rows = [(1, i) for i in range(20)] + [(2, 1), (2, 2), (3, 7)]
    df = spark.createDataFrame(rows, "g: long, item: long")
    unguarded = sorted(
        (r.a, r.b)
        for r in graph.cooccurrence_pairs(
            df, "g", "item", max_group_size=None
        ).collect()
    )
    hybrid = sorted(
        (r.a, r.b)
        for r in graph.cooccurrence_pairs(
            df, "g", "item", max_group_size=5, on_oversize="selfjoin"
        ).collect()
    )
    assert hybrid == unguarded
    assert len(hybrid) == 20 * 19 // 2 + 1


def test_cooccurrence_guard_adds_no_exchange(spark):
    # the default (error) guard is an expression inside the kept
    # projection: plan shape — exchange count in particular — must be
    # identical to the unguarded form (consumer plans unchanged)
    rows = [(1, 10), (1, 20), (2, 10)]
    df = spark.createDataFrame(rows, "g: long, item: long")
    plan_guarded = graph.cooccurrence_pairs(
        df, "g", "item"
    )._jdf.queryExecution().executedPlan().toString()
    plan_open = graph.cooccurrence_pairs(
        df, "g", "item", max_group_size=None
    )._jdf.queryExecution().executedPlan().toString()
    assert plan_guarded.count("Exchange") == plan_open.count("Exchange")
    assert "raise_error" in plan_guarded or "raiseerror" in plan_guarded.lower()


def test_keyed_edge_cache_unpersists_on_any_exit(spark):
    """The shared edge-cache context manager must release its
    MEMORY_AND_DISK blocks on BOTH exit paths — a crashed iterative
    loop must not pin a materialized edge list in the session's block
    manager for its remaining lifetime."""
    from pyspark import StorageLevel

    from tmp_parquet_merge_spark.operators._iter_cache import (
        keyed_edge_cache,
    )

    df = spark.range(1000).selectExpr("id as src", "id + 1 as dst")
    with keyed_edge_cache(df, "src", 4) as edges:
        edges.count()  # materialize the cache
        assert edges.storageLevel == StorageLevel.MEMORY_AND_DISK
        kept = edges
    assert kept.storageLevel == StorageLevel.NONE  # clean exit releases

    with pytest.raises(RuntimeError, match="boom"):
        with keyed_edge_cache(df, "src") as edges:
            edges.count()
            assert edges.storageLevel == StorageLevel.MEMORY_AND_DISK
            raise RuntimeError("boom")
    assert edges.storageLevel == StorageLevel.NONE  # failure releases too
