"""Property-based test (hypothesis) for the interpolated bigram LM
(operators/text.py::bigram_lm_score) against a pure-Python reference
on random tiny-vocabulary corpora — the shapes that exercise every
edge at once: one-word docs (NULL score, row retained), repeated
bigrams within a doc, vocabulary collisions across docs, and the
exact-integer half-away rounding at negative sums."""

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tmp_parquet_merge_spark.operators.text import bigram_lm_score

_VOCAB = ["a", "b", "c"]
_DOCS = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=6),
    min_size=1,
    max_size=5,
)


def _round6(x: float) -> Decimal:
    return Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def _reference(docs):
    """Spec-exact reference: JM-interpolated bigram probabilities,
    DECIMAL(18,6) contribution sums, exact-integer half-away final
    rounding (micro = sign * ((2|s_int| + n) // (2n)))."""
    cb, cw = {}, {}
    for w in docs:
        for a, b in zip(w, w[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
        for t in w:
            cw[t] = cw.get(t, 0) + 1
    cv = {}
    for (a, _), c in cb.items():
        cv[a] = cv.get(a, 0) + c
    n_total = sum(cw.values())
    out = {}
    for i, w in enumerate(docs):
        tf = {}
        for a, b in zip(w, w[1:]):
            tf[(a, b)] = tf.get((a, b), 0) + 1
        if not tf:
            out[i] = (0, None)
            continue
        s = Decimal(0)
        for (a, b), c in tf.items():
            p = 0.75 * (cb[(a, b)] / cv[a]) + 0.25 * (cw[b] / n_total)
            s += _round6(c * math.log(p))
        n = sum(tf.values())
        s_int = int(s.scaleb(6))  # exact: s has scale 6
        sign = -1 if s_int < 0 else 1
        micro = sign * ((2 * abs(s_int) + n) // (2 * n))
        out[i] = (n, micro / 1000000.0)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_DOCS)
def test_bigram_lm_matches_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.lm2_score)
        for r in bigram_lm_score(df, "text", "doc_id").collect()
    }
    assert got == _reference(docs)
