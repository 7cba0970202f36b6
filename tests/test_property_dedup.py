"""Property-based test (hypothesis) for the connected-components
operator (operators/dedup.py::dedup_clusters) against a union-find
reference on random graphs — pinning min-label propagation on shapes
the bundled corpora never produce (long chains, isolated nodes, dense
blobs, self-loop-free multigraphs).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tmp_parquet_merge_spark.operators.dedup import dedup_clusters

_N = 12  # node ids 0.._N-1
_EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=_N - 1),
        st.integers(min_value=0, max_value=_N - 1),
    ),
    min_size=0,
    max_size=18,
)


def _union_find_reference(edges):
    parent = list(range(_N))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in range(_N):
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_EDGES)
def test_dedup_clusters_matches_union_find(spark, edges):
    # drop self-loops: the pair generators never emit (x, x)
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:
        pairs = pairs.filter("doc_a <> doc_b")  # empty edge set
    nodes = spark.createDataFrame(
        [(n,) for n in range(_N)], "doc_id long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(pairs, nodes, "doc_id").collect()
    }
    assert got == _union_find_reference(edges)
