"""Property-based test (hypothesis) for the repeated-segment pair
(operators/dedup.py::segment_blacklist / segments_clean) against a
pure-Python stride reference on random tiny-vocabulary corpora —
the r10 verdict #7 extension of test_property_substring.py to the
aligned stride-n siblings.  Shapes the bundled corpora never
produce: heavy window collisions, ragged tails of every length mod
n, all-boilerplate docs, docs shorter than one window, single-word
docs.  Small n=3 keeps each example cheap; the registered queries
run the same code path at n=10.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tmp_parquet_merge_spark.operators.dedup import (
    segment_blacklist,
    segments_clean,
)

_VOCAB = ["a", "b", "c", "d"]
_DOCS = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=11),
    min_size=2,
    max_size=4,
)
_N = 3


def _reference(word_lists):
    """Spec-exact stride reference: non-overlapping full n-word
    windows; windows in >= 2 distinct docs form the blacklist; the
    rewrite drops blacklisted windows, keeps window order and the
    ragged tail, and returns exactly one row per input doc."""
    segs = {
        i: [
            tuple(w[p : p + _N])
            for p in range(0, len(w) - _N + 1, _N)
        ]
        for i, w in word_lists.items()
    }
    by_seg = {}
    for i, ss in segs.items():
        for s in ss:
            by_seg.setdefault(s, set()).add(i)
    blacklist = {
        " ".join(s): len(docs)
        for s, docs in by_seg.items()
        if len(docs) >= 2
    }
    clean = {}
    for i, w in word_lists.items():
        kept, dropped = [], 0
        for s in segs[i]:
            if tuple(s) in by_seg and len(by_seg[tuple(s)]) >= 2:
                dropped += 1
            else:
                kept.extend(s)
        tail_start = len(segs[i]) * _N
        kept.extend(w[tail_start:])
        clean[i] = (" ".join(kept), dropped)
    return blacklist, clean


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_DOCS)
def test_segment_pair_matches_reference(spark, docs):
    word_lists = {i: w for i, w in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in word_lists.items()],
        "doc_id long, text string",
    )
    want_bl, want_clean = _reference(word_lists)

    got_bl = {
        r.segment: r.doc_freq
        for r in segment_blacklist(df, "text", "doc_id", n=_N).collect()
    }
    assert got_bl == want_bl

    got_clean = {
        r.doc_id: (r.clean_text, r.n_dropped)
        for r in segments_clean(df, "text", "doc_id", n=_N).collect()
    }
    assert got_clean == want_clean


def test_segment_edge_cases_pinned(spark):
    """Deterministic pins for the k-boundary cases the random suite
    may or may not generate in a given run: doc shorter than one
    window, doc of exactly one window, all-boilerplate doc (empty
    rewrite), ragged tail preserved verbatim."""
    df = spark.createDataFrame(
        [
            (1, "x y z p q r tail1 tail2"),  # 2 windows + 2-word tail
            (2, "x y z p q r"),              # the same 2 windows, no tail
            (3, "x y"),                      # under one window: pass-through
            (4, "x y z"),                    # exactly one (shared) window
        ],
        "doc_id long, text string",
    )
    bl = {
        r.segment: r.doc_freq
        for r in segment_blacklist(df, "text", "doc_id", n=3).collect()
    }
    assert bl == {"x y z": 3, "p q r": 2}
    got = {
        r.doc_id: (r.clean_text, r.n_dropped)
        for r in segments_clean(df, "text", "doc_id", n=3).collect()
    }
    assert got == {
        1: ("tail1 tail2", 2),
        2: ("", 2),
        3: ("x y", 0),
        4: ("", 1),
    }
