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

from tmp_parquet_merge_spark.operators.text import bpe_apply, bpe_train

_WORD = st.text(alphabet="ab", min_size=1, max_size=6)
_DOC = st.lists(_WORD, min_size=1, max_size=8).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=5)
_K = 3


def _ref_train(word_counts: dict, k: int):
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, k + 1):
        pc = collections.Counter()
        for w, c in word_counts.items():
            sy = vocab[w]
            for i in range(len(sy) - 1):
                pc[(sy[i], sy[i + 1])] += c
        if not pc:
            break
        (l, r), n = min(
            pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((step, l, r, l + r, n))
        for w, sy in vocab.items():
            out = []
            for s in sy:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_bpe_train_and_apply_match_reference(spark, corpus):
    wc = collections.Counter(w for d in corpus for w in d.split())
    want_merges, fitted = _ref_train(wc, _K)
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
