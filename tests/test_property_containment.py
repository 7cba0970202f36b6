"""Property-based test (hypothesis) for the containment scale path
(operators/dedup.py::containment_pairs_rare_shingle) against a
pure-Python exact containment reference on random tiny-vocabulary
corpora — the adversarial shapes the bundled corpora never produce
(r13 verdict #3): boilerplate-heavy contained spans (df > max_df),
sub-min_shared short docs, and df values straddling max_df.

The pinned property is the operator's whole recall contract, not just
bundled-tier equality: the emitted pair set must equal the exact
containment relation INTERSECTED with the structural candidate
predicate (shared RARE shingles >= least(min_shared, rare_na,
rare_nb), with a doc of zero rare shingles having no index rows at
all) — i.e. a qualifying pair may be missed ONLY when the contained
text is boilerplate-dominated in exactly the documented way, and
everything emitted is exact.  A deterministic case at the bottom
pins the one legitimate miss class (boilerplate-ONLY containment)
and asserts it is the only miss.

Small operator parameters (n=2, max_df=3, min_shared=2,
threshold=0.6) keep each example cheap and collisions dense; the
registered query uses the same code path at (3, 16, 3, 0.8).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tmp_parquet_merge_spark.operators.dedup import (
    containment_pairs_rare_shingle,
    ngram_containment_pairs,
)

_VOCAB = ["a", "b", "c", "d"]
_DOCS = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12),
    min_size=2,
    max_size=6,
)
_N, _MAX_DF, _MIN_SHARED, _THRESH = 2, 3, 2, 0.6


def _shingles(w: list[str]) -> frozenset:
    """Mirror operators/dedup.py::shingle_rows: distinct full n-grams,
    plus the position-0 partial shingle for docs shorter than n."""
    if len(w) < _N:
        return frozenset({" ".join(w)})
    return frozenset(
        " ".join(w[p : p + _N]) for p in range(len(w) - _N + 1)
    )


def _reference(word_lists: dict[int, list[str]]):
    """Exact containment pairs + the structural candidate predicate."""
    sets = {i: _shingles(w) for i, w in word_lists.items()}
    df_count: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    rare = {g for g, c in df_count.items() if 2 <= c <= _MAX_DF}
    exact, candidates = {}, set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            cab = round(inter / len(sets[a]), 6)
            cba = round(inter / len(sets[b]), 6)
            if cab >= _THRESH or cba >= _THRESH:
                exact[(a, b)] = (cab, cba)
            rare_a = len(sets[a] & rare)
            rare_b = len(sets[b] & rare)
            shared_rare = len(sets[a] & sets[b] & rare)
            floor = min(_MIN_SHARED, rare_a, rare_b)
            if shared_rare >= 1 and shared_rare >= floor:
                candidates.add((a, b))
    return exact, candidates


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_DOCS)
def test_containment_rare_shingle_recall_contract(spark, docs):
    word_lists = {i: w for i, w in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in word_lists.items()],
        "doc_id long, text string",
    )
    exact, candidates = _reference(word_lists)

    got_exact = {
        (r.doc_a, r.doc_b): (r.cont_ab, r.cont_ba)
        for r in ngram_containment_pairs(
            df, "text", "doc_id", n=_N, threshold=_THRESH
        ).collect()
    }
    assert got_exact == exact, "exact twin must match the reference"

    got_fed = {
        (r.doc_a, r.doc_b): (r.cont_ab, r.cont_ba)
        for r in containment_pairs_rare_shingle(
            df,
            "text",
            "doc_id",
            n=_N,
            threshold=_THRESH,
            max_df=_MAX_DF,
            min_shared=_MIN_SHARED,
        ).collect()
    }
    want_fed = {p: v for p, v in exact.items() if p in candidates}
    assert got_fed == want_fed, (
        "rare-shingle path must emit exactly the exact pairs passing "
        "the structural candidate predicate — no other miss class, "
        "nothing non-exact emitted"
    )


def test_containment_boilerplate_only_miss_is_the_only_miss(spark):
    """The one legitimate miss class, constructed: doc 0's entire
    shingle set is boilerplate (df > max_df), so it has zero rare
    index rows and the pair (0, 1) is structurally missed — while a
    second contained doc with rare shingles IS found, proving the
    miss class is exactly the documented one."""
    rows = [
        # doc 0: every shingle ('a b', 'b c') appears in > max_df docs
        (0, "a b c"),
        (1, "a b c d a b c"),  # contains doc 0 (and doc 2's content)
        (2, "c d a"),  # rare shingles ('c d', 'd a') -> found
        # boilerplate amplifiers for 'a b' / 'b c' (df 6 > max_df 3)
        (3, "a b c b"),
        (4, "d a b c"),
        (5, "b c a b"),
        (6, "a b d b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    kw = dict(n=_N, threshold=0.99)
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_containment_pairs(df, "text", "doc_id", **kw).collect()
    }
    fed = {
        (r.doc_a, r.doc_b)
        for r in containment_pairs_rare_shingle(
            df, "text", "doc_id", max_df=_MAX_DF, min_shared=_MIN_SHARED, **kw
        ).collect()
    }
    assert (0, 1) in exact, "boilerplate-only containment exists exactly"
    assert (2, 1) in exact or (1, 2) in exact
    missed = exact - fed
    # doc 0 is contained in the amplifier docs as well — every one of
    # those pairs is the SAME miss class (doc 0 has zero rare index
    # rows); no pair not involving doc 0 may be missed
    assert missed and all(0 in p for p in missed), (
        f"only boilerplate-only (doc 0) pairs may be missed: {missed}"
    )
    assert (0, 1) in missed
    # and the found contained doc proves rare shingles rescue recall
    assert any(2 in p for p in fed)
