"""Distributed graph algorithms over edge-list DataFrames.

The reference has no graph operators (SURVEY.md §0); this extends the
engine's iterative-algorithm family (k-means in similarity.py,
connected components in dedup.py) with PageRank — the canonical
"repeat a join-aggregate until converged" workload, and the shape a
link-analysis pass over a 100 TB web-crawl corpus takes.

Scale notes: each iteration is one join (rank ⋈ edges, keyed on the
source node — both sides hash-partitioned the same way, so AQE reuses
the exchange across iterations) plus one map-side-combined aggregate
keyed on the destination.  Rank state is O(nodes), never collected;
``localCheckpoint`` truncates the lineage each round so the plan
doesn't grow with iteration count (same discipline as
dedup.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected → directed: emit each edge in both directions."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionByName(rev)


def pagerank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    max_iter: int = 10,
    tol: float = 1e-6,
    round_to: int = 6,
    check_every: int = 1,
) -> DataFrame:
    """PageRank over a directed edge list (columns ``src``, ``dst``).

    Returns (node, rank, n_iter) with ranks summing to ~1.  Dangling
    nodes (no out-edges) redistribute their mass uniformly each round —
    the standard formulation, kept exactly so the NumPy reference in
    tests/test_graph.py matches to float tolerance.

    Every round: contribs = rank/out_deg joined through edges (one
    shuffle on src, one agg shuffle on dst — both reuse the same hash
    partitioning).  Iterative-loop economics: the dangling mass rides
    the PLAN as a broadcast 1-row aggregate (crossJoin), not a driver
    action — and is skipped entirely when a one-time upfront probe
    shows the graph has no dangling nodes (symmetrized graphs never
    do), so a round costs exactly ONE job (the eager localCheckpoint
    that also truncates lineage) plus, every ``check_every`` rounds, a
    scalar L1-delta read for the ``tol`` early exit.
    """
    # materialize the edge list once — callers often pass a derived
    # graph (e.g. a self-join pair build) that must not be recomputed
    # in every iteration's join
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # node, deg (0 for dangling), rank
    state = (
        nodes.join(out_deg, nodes.node == out_deg.src, "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg"))
        .withColumn("rank", F.lit(1.0 / n_nodes))
        .localCheckpoint()
    )
    has_dangling = state.filter(F.col("deg") == 0).limit(1).count() > 0
    it = 0
    for it in range(1, max_iter + 1):
        contribs = (
            state.filter(F.col("deg") > 0)
            .join(edges, state.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        rank_expr = F.lit((1.0 - damping) / n_nodes) + F.lit(
            damping
        ) * F.coalesce("inflow", F.lit(0.0))
        joined = state.drop("rank").join(contribs, "node", "left")
        if has_dangling:
            dmass = state.filter(F.col("deg") == 0).agg(
                F.sum("rank").alias("_dmass")
            )
            joined = joined.crossJoin(F.broadcast(dmass))
            rank_expr = rank_expr + F.lit(damping) * F.col("_dmass") / n_nodes
        new_state = joined.select(
            "node", "deg", rank_expr.alias("rank")
        ).localCheckpoint()
        if tol > 0 and (it % check_every == 0 or it == max_iter):
            delta = (
                state.select("node", F.col("rank").alias("r0"))
                .join(new_state.select("node", "rank"), "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("r0"))))
                .first()[0]
            )
            state = new_state
            if delta < tol:
                break
        else:
            state = new_state
    return state.select(
        "node",
        F.round("rank", round_to).alias("rank"),
        F.lit(it).alias("n_iter"),
    )
