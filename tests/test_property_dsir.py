"""Property-based test (hypothesis) for the DSIR weight computation
(operators/curation.py::dsir_weights) against a pure-Python reference
on random tiny-vocabulary corpora — shapes the bundled corpora never
produce: single-word docs (no bigrams beyond none), all-target /
no-target corpora, hash-bucket collisions at a tiny B (the reference
hashes with the SAME md5 spelling, so collisions are part of the
spec, not noise).  Small B=8 forces heavy collisions; the registered
query uses the same code path at B=2048."""

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tmp_parquet_merge_spark.operators.curation import dsir_weights

_VOCAB = ["a", "b", "c"]
_DOCS = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=6),
        st.booleans(),  # is_target (lang == 'en')
    ),
    min_size=1,
    max_size=5,
)
_B = 8


def _bucket(term: str) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % _B


def _round6(x: float) -> Decimal:
    """Spark ROUND: HALF_UP on the exact binary double."""
    return Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def _reference(docs):
    """Spec-exact reference: unigram+bigram md5 buckets, add-1
    smoothed target/corpus models, DECIMAL(18,6) contribution sums,
    final 6-dp round of the decimal-summed double."""
    per_doc, stats = {}, {}
    for i, (w, tgt) in enumerate(docs):
        terms = list(w) + [f"{a} {b}" for a, b in zip(w, w[1:])]
        counts = {}
        for t in terms:
            counts[_bucket(t)] = counts.get(_bucket(t), 0) + 1
        per_doc[i] = (tgt, counts)
        for b, c in counts.items():
            cs, ct = stats.get(b, (0, 0))
            stats[b] = (cs + c, ct + c if tgt else ct)
    ts = sum(cs for cs, _ in stats.values())
    tt = sum(ct for _, ct in stats.values())
    lam = {
        b: math.log((ct + 1) / (tt + float(_B)))
        - math.log((cs + 1) / (ts + float(_B)))
        for b, (cs, ct) in stats.items()
    }
    out = {}
    for i, (tgt, counts) in per_doc.items():
        s = sum(
            (_round6(c * lam[b]) for b, c in counts.items()),
            Decimal(0),
        )
        out[i] = (sum(counts.values()), float(_round6(float(s))))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_DOCS)
def test_dsir_weights_match_reference(spark, docs):
    df = spark.createDataFrame(
        [
            (i, " ".join(w), "en" if tgt else "xx")
            for i, (w, tgt) in enumerate(docs)
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r.doc_id: (r.n_terms, r.logw)
        for r in dsir_weights(
            df, "text", "doc_id", "lang", "en", n_buckets=_B
        ).collect()
    }
    assert got == _reference(docs)
