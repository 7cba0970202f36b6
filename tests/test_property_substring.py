"""Property-based test (hypothesis) for the repeated-substring pair
(operators/dedup.py::substring_dup_spans / substring_clean) against a
pure-Python reference on random tiny-vocabulary corpora — shapes the
bundled corpora never produce: heavy gram collisions, overlapping
qualifying runs, all-repeated docs, docs shorter than the gram width.
Small (k=3, min_len=5) operator parameters keep each example cheap;
the registered queries use the same code path at (10, 20).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tmp_parquet_merge_spark.operators.dedup import (
    substring_clean,
    substring_dup_spans,
)

_VOCAB = ["a", "b", "c", "d"]
_DOCS = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12),
    min_size=2,
    max_size=4,
)
_K, _L = 3, 5


def _reference(word_lists):
    """Spec-exact reference: sliding k-grams shared by >=2 distinct
    docs, maximal consecutive-position runs spanning >= min_len words,
    per-doc (n_words, n_runs, union cover) and the rewrite."""
    grams = {
        i: [tuple(w[p : p + _K]) for p in range(len(w) - _K + 1)]
        for i, w in word_lists.items()
    }
    byg = {}
    for i, gs in grams.items():
        for g in gs:
            byg.setdefault(g, set()).add(i)
    shared = {g for g, docs in byg.items() if len(docs) >= 2}
    spans, clean = {}, {}
    for i, w in word_lists.items():
        runs = []
        for p in (p for p, g in enumerate(grams[i]) if g in shared):
            if runs and p == runs[-1][-1] + 1:
                runs[-1].append(p)
            else:
                runs.append([p])
        qruns = [r for r in runs if r[-1] - r[0] + _K >= _L]
        covered = set()
        for r in qruns:
            for p in r:
                covered.update(range(p, p + _K))
        if qruns:
            spans[i] = (len(w), len(qruns), len(covered))
        clean[i] = (
            " ".join(w[j] for j in range(len(w)) if j not in covered),
            len(covered),
        )
    return spans, clean


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_DOCS)
def test_substring_pair_matches_reference(spark, docs):
    word_lists = {i: w for i, w in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in word_lists.items()],
        "doc_id long, text string",
    )
    want_spans, want_clean = _reference(word_lists)

    got_spans = {
        r.doc_id: (r.n_words, r.dup_spans, r.dup_words)
        for r in substring_dup_spans(
            df, "text", "doc_id", k=_K, min_len=_L
        ).collect()
    }
    assert got_spans == want_spans

    got_clean = {
        r.doc_id: (r.clean_text, r.n_dropped)
        for r in substring_clean(
            df, "text", "doc_id", k=_K, min_len=_L
        ).collect()
    }
    assert got_clean == want_clean
