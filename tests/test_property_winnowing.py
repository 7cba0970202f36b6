"""Property-based test (hypothesis) for winnowing fingerprint
selection (operators/text.py::winnowing_select /
winnowing_fingerprints) against a pure-Python reference implementing
Schleimer/Wilkerson/Aiken's definition directly — min hash per window
of w consecutive k-gram hashes, rightmost position on ties — plus the
paper's structural guarantees on every generated corpus:

  * every selected fingerprint is the rightmost minimum of at least
    one full window (soundness of the BIGINT tie encoding);
  * consecutive selections are at most w positions apart (the
    winnowing coverage guarantee — no window is left without a
    selection);
  * two docs sharing a substring of length >= k+w-1 share a selected
    hash (the matching guarantee, exercised by generating doc pairs
    with planted shared spans).

Small k=4, w=4 keeps each example cheap; the registered query runs
the same code path at k=8, w=8.
"""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tmp_parquet_merge_spark.operators.text import (
    winnowing_fingerprints,
    winnowing_select,
)

_K, _W = 4, 4
_POS_CAP = 1 << 20
_ALPHA = "ab c"  # tiny alphabet incl. space: heavy gram collisions


def _h40(gram: str) -> int:
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:10], 16)


def _norm(text: str) -> str:
    import re

    return re.sub(r"[ \t\n\f\r]+", " ", text.strip().lower())


def _reference(text: str):
    """Spec winnowing: for each window of _W consecutive k-gram
    hashes, select the minimum, rightmost on ties; return the
    selected (pos, hash) set (1-based positions)."""
    norm = _norm(text)
    npos = len(norm) - _K + 1
    if npos < _W:
        return None, set()
    hs = [_h40(norm[p : p + _K]) for p in range(npos)]
    sel = set()
    for s in range(npos - _W + 1):
        win = hs[s : s + _W]
        m = min(win)
        # rightmost occurrence of the min
        off = max(j for j, v in enumerate(win) if v == m)
        sel.add((s + off + 1, m))
    return npos, sel


_TEXTS = st.lists(
    st.text(alphabet=_ALPHA, min_size=0, max_size=40),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_TEXTS)
def test_winnowing_select_matches_reference(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    # forced-small chunk_positions exercises the multi-chunk path on
    # every example (docs here are ≤ 40 chars, so chunk_positions=6
    # with w=4 gives stride 3 — several chunks per doc); the union of
    # per-chunk selections must STILL equal the spec selection set
    for r in winnowing_select(
        df, "text", "doc_id", k=_K, w=_W, chunk_positions=6
    ).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.h))
    for i, t in rows:
        npos, want = _reference(t)
        if npos is None:
            assert i not in got
            continue
        assert got.get(i, set()) == want, (i, t)
        # coverage guarantee: sorted selected positions are never more
        # than _W apart, and the first/last selections cover the ends
        ps = sorted(p for p, _ in want)
        assert ps[0] <= _W and ps[-1] >= npos - _W + 1
        assert all(b - a <= _W for a, b in zip(ps, ps[1:]))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    shared=st.text(alphabet=_ALPHA, min_size=_K + _W - 1, max_size=20),
    pre_a=st.text(alphabet=_ALPHA, min_size=0, max_size=10),
    pre_b=st.text(alphabet=_ALPHA, min_size=0, max_size=10),
)
def test_winnowing_matching_guarantee(spark, shared, pre_a, pre_b):
    """Any two docs sharing a substring of length >= k+w-1 share at
    least one selected HASH — Schleimer et al.'s Theorem guarantee,
    checked on the normalized form (whitespace collapse can shorten
    the planted span below the bound, in which case the guarantee
    doesn't apply and the example is vacuous)."""
    a, b = pre_a + shared, pre_b + shared
    span_a, span_b = _norm(a), _norm(b)
    # longest common suffix of the normalized docs = the surviving span
    n = 0
    while (
        n < min(len(span_a), len(span_b))
        and span_a[len(span_a) - 1 - n] == span_b[len(span_b) - 1 - n]
    ):
        n += 1
    if n < _K + _W - 1:
        return  # normalization shortened the span: guarantee vacuous
    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    by_doc = {}
    for r in winnowing_select(df, "text", "doc_id", k=_K, w=_W).collect():
        by_doc.setdefault(r.doc_id, set()).add(r.h)
    assert by_doc.get(0, set()) & by_doc.get(1, set()), (a, b)


def test_winnowing_fingerprints_consistency(spark):
    """The audit aggregate is exactly the per-doc rollup of the
    selection relation (count / hash sum / density)."""
    df = spark.createDataFrame(
        [(1, "ab c ab c ab c ab ab"), (2, "c ab ab c c c ab")],
        "doc_id long, text string",
    )
    sel = {}
    for r in winnowing_select(df, "text", "doc_id", k=_K, w=_W).collect():
        sel.setdefault(r.doc_id, []).append(r)
    agg = {
        r.doc_id: r
        for r in winnowing_fingerprints(
            df, "text", "doc_id", k=_K, w=_W
        ).collect()
    }
    for i, rows in sel.items():
        assert agg[i].n_fp == len(rows)
        assert agg[i].fp_sum == sum(r.h for r in rows)
        assert agg[i].n_grams == rows[0].npos
        assert agg[i].density == round(len(rows) / rows[0].npos, 6)


def test_winnowing_chunked_equals_unchunked(spark):
    """r12 verdict #4's done-criterion, first half: the chunked path at
    several chunk sizes must reproduce the single-chunk selection set
    (hash AND global position) exactly — every original window is
    evaluated in exactly one chunk (stride = chunk_positions − (w−1)),
    and winnowing is window-local, so the union re-attributed to
    parent positions is the unchunked set bit for bit."""
    import random

    rng = random.Random(13)
    texts = [
        (0, "".join(rng.choice(_ALPHA) for _ in range(997))),
        (1, "ab c" * 200),
        (2, "".join(rng.choice("abcdefgh ") for _ in range(500))),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    def select_at(cp):
        got = {}
        for r in winnowing_select(
            df, "text", "doc_id", k=_K, w=_W, chunk_positions=cp
        ).collect():
            got.setdefault(r.doc_id, set()).add((r.pos, r.h))
        return got

    single = select_at(1 << 18)  # one chunk per doc: the classic path
    for i, t in texts:
        npos, want = _reference(t)
        assert single.get(i, set()) == want
    for cp in (_W, 7, 64, 333):
        assert select_at(cp) == single, f"chunk_positions={cp}"


def test_winnowing_million_char_doc_runs():
    """r12 verdict #4's done-criterion, second half: a >2^20-char
    document — previously a loud raise_error — fingerprints without
    error, with the selection density near the expected 2/(w+1) and
    positions spanning the whole document."""
    from tmp_parquet_merge_spark.session import get_spark

    spark = get_spark("tests")
    n = (1 << 20) + 20000  # normalized length stays > 2^20 after
    # whitespace-run collapse (~0.8% shrink on this alphabet)
    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefghij ") for _ in range(n))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    agg = winnowing_fingerprints(df, "text", "doc_id", k=8, w=8).collect()
    assert len(agg) == 1
    row = agg[0]
    # n_grams is over the NORMALIZED text (whitespace runs collapse)
    assert row.n_grams == len(_norm(text)) - 7
    assert row.n_grams > (1 << 20)
    # expected density 2/(w+1) = 0.2222 on random text
    assert 0.15 < row.density < 0.30
    sel = winnowing_select(df, "text", "doc_id", k=8, w=8).collect()
    ps = [r.pos for r in sel]
    assert min(ps) >= 1 and max(ps) > (1 << 20)
    assert len(sel) == row.n_fp


def test_winnowing_chunk_repartition_plan_and_dedup_equivalence(spark):
    """r14 optimization round: winnowing's single path shuffles chunk
    SLICES once on (id, off) before the gram explode, and the window
    REUSES that hashpartitioning — the plan has exactly two Exchanges
    (the chunk repartition + the selection distinct), never a gram-row
    exchange; the gram/md5 projection sits ABOVE the repartition so
    hashing parallelizes independent of scan splits.  dedup=False
    (the winnow_overlap consumer) drops the distinct exchange, and its
    multiset deduplicates to exactly the default selection set."""
    import random

    rng = random.Random(29)
    texts = [
        (0, "".join(rng.choice(_ALPHA) for _ in range(1200))),
        (1, "".join(rng.choice("abcdefgh ") for _ in range(300))),
        (2, "ab c" * 150),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    def sel_set(plan_df):
        got = {}
        for r in plan_df.collect():
            got.setdefault(r.doc_id, set()).add((r.pos, r.h))
        return got

    base_df = winnowing_select(
        df, "text", "doc_id", k=_K, w=_W, chunk_positions=64
    )
    raw_df = winnowing_select(
        df, "text", "doc_id", k=_K, w=_W, chunk_positions=64, dedup=False
    )
    base, raw = sel_set(base_df), sel_set(raw_df)
    assert raw == base

    def plan_str(plan_df):
        # keep only the AQE final plan when the query has executed
        # (toString then prints Final + Initial sections)
        s = plan_df._jdf.queryExecution().executedPlan().toString()
        return s.split("== Initial Plan ==")[0]

    d, r = plan_str(base_df), plan_str(raw_df)
    # default: chunk repartition (reused by the window) + distinct —
    # exactly two; dedup=False drops the distinct exchange
    assert d.count("Exchange") == 2, d
    assert r.count("Exchange") == 1, r
    # no gram-row exchange: in the printed tree (parents first), the
    # segment from the Window down to the gram explode (the LAST
    # Generate) holds Sort/Project/Generate only — the window rides
    # the chunk repartition's partitioning, and the md5 projection
    # (between the two) therefore runs on the post-exchange side
    assert "Window" in d
    # first Generate below the Window = the gram explode
    seg = d[d.index("Window") : d.index("Generate", d.index("Window"))]
    assert "Exchange" not in seg, seg
    assert "md5" in seg  # gram hashing sits under the window, above
    # the exchange — i.e. AFTER the chunk shuffle, cluster-parallel
