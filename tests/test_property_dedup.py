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


_DOC_WORDS = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
    min_size=4,
    max_size=10,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=_DOC_WORDS, n_copies=st.integers(min_value=2, max_value=4))
def test_minhash_always_catches_exact_duplicates(spark, words, n_copies):
    """Deterministic MinHash guarantee: identical documents have
    identical signatures, hence identical band keys — exact copies can
    NEVER be missed by LSH, at any banding.  (Near-dup recall is
    probabilistic; exact-dup recall is not.)"""
    from tmp_parquet_merge_spark.operators.dedup import minhash_dedup_pairs

    text = " ".join(words)
    rows = [(i, text) for i in range(n_copies)]
    # distinct decoys that share no shingle vocabulary with the copies
    rows += [
        (100 + j, " ".join(f"decoy{j}word{k}" for k in range(6)))
        for j in range(2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_dedup_pairs(
            df, "text", "doc_id", verify_threshold=0.5
        ).collect()
    }
    expected = {
        (a, b)
        for a in range(n_copies)
        for b in range(n_copies)
        if a < b
    }
    assert expected <= pairs
    # and no copy↔decoy pair survives the Jaccard verify
    assert all(a < 100 and b < 100 for a, b in pairs)
