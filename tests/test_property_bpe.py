"""Property-based test (hypothesis) for multi-round BPE training
(operators/text.py::bpe_train / bpe_apply) against a pure-Python
Sennrich et al. reference on random tiny-vocabulary corpora — shapes
the bundled corpus never produces: single-char words, runs of one
symbol (the greedy-overlap case), count ties resolved by pair order,
vocabularies that exhaust their pair space before the round budget.

Small n_merges=3 keeps each example cheap; the registered queries run
the same code path at 8.
"""

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bpe_reference import ref_bpe
from tmp_parquet_merge_spark.operators.text import bpe_apply, bpe_train

_WORD = st.text(alphabet="ab", min_size=1, max_size=6)
_DOC = st.lists(_WORD, min_size=1, max_size=8).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=5)
_K = 3


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_bpe_train_and_apply_match_reference(spark, corpus):
    wc = collections.Counter(w for d in corpus for w in d.split())
    want_merges, fitted = ref_bpe(wc, _K)
    rows = [(i, d, "s%d" % (i % 2)) for i, d in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")

    got = [tuple(r) for r in bpe_train(df, "text", n_merges=_K).collect()]
    assert got == want_merges

    want_apply = {}
    for i, d in enumerate(corpus):
        ws = d.split()
        acc = want_apply.setdefault("s%d" % (i % 2), [0, 0])
        acc[0] += len(ws)
        acc[1] += sum(len(fitted[w]) for w in ws)
    got_apply = {
        r.source: (r.n_words, r.n_tokens, r.fertility)
        for r in bpe_apply(df, "text", "source", n_merges=_K).collect()
    }
    assert set(got_apply) == set(want_apply)
    for s, (nw, nt) in want_apply.items():
        assert got_apply[s] == (nw, nt, round(nt / nw, 6)), s


def test_bpe_oracle_pair_exhaustion_parity(spark):
    """Mid-round r14 review: when the corpus's pair space exhausts
    before n_merges rounds, Spark's loop BREAKs and keeps the last
    symbolization; the oracle's empty m{k} must leave v{k} unchanged
    (LEFT JOIN ON TRUE), not empty it — both engines, same tiny
    corpus, same rows."""
    import duckdb

    from tmp_parquet_merge_spark.queries_llm import (
        _bpe_apply_oracle,
        _bpe_train_oracle,
    )

    docs = [(1, "ab c", "en", "web", 4), (2, "ab", "en", "books", 2)]
    df = spark.createDataFrame(
        docs, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    got_train = [tuple(r) for r in bpe_train(df, "text", n_merges=3).collect()]
    got_apply = [
        tuple(r) for r in bpe_apply(df, "text", "source", n_merges=3).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(str(d) for d in docs)
        + ") t(doc_id, text, lang, source, n_chars)"
    )
    want_train = con.execute(_bpe_train_oracle(3)).fetchall()
    want_apply = con.execute(_bpe_apply_oracle(3)).fetchall()
    assert got_train == want_train == [(1, "a", "b", "ab", 2)]
    assert sorted(got_apply) == sorted(want_apply) == [
        ("books", 1, 1, 1.0),
        ("web", 2, 2, 1.0),
    ]
