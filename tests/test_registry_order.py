"""Driver-window registration order.

The correctness driver evaluates only the first 50 registry entries
per round, so insertion order decides which queries get evidence
(queries.py's _reorder_registry).  These tests pin the invariants: the
window is spent first on queries whose CURRENT implementation has no
driver evidence (new / changed / errored / never run), changed queries
are always re-queued, and nothing is lost in the reshuffle.
"""

from tmp_parquet_merge_spark.queries import (
    REGISTRY,
    _CHANGED_THIS_ROUND,
    _DRIVER_FIRST,
    _EVIDENCE_ROUND,
    _HASH_GREEN,
    _ROWS_SEEN,
    _driver_tier,
    _sort_key,
)

DRIVER_WINDOW = 50


def _evidenced(n, q):
    return (
        n in (_HASH_GREEN if q.oracle is not None else _ROWS_SEEN)
        and n not in _CHANGED_THIS_ROUND
    )


def test_registry_complete_and_unique():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 101  # round-2 surface never shrinks
    # every name in the evidence ledger still registered
    for n in _HASH_GREEN | _ROWS_SEEN | _CHANGED_THIS_ROUND:
        assert n in REGISTRY, n


def test_sort_keys_are_monotonic():
    keys = [_sort_key(q) for q in REGISTRY.values()]
    assert keys == sorted(keys)


def test_named_evidence_debts_lead():
    # the round-2 verdict's gap #1: the never-driver-run /
    # stale-evidence queries take the first slots, in the named order
    assert tuple(REGISTRY)[: len(_DRIVER_FIRST)] == _DRIVER_FIRST
    for n in _DRIVER_FIRST:
        assert not _evidenced(n, REGISTRY[n]), (
            f"{n} is evidenced — drop it from _DRIVER_FIRST"
        )


def test_changed_queries_always_requeued():
    # the advisor's rule: evidence certifies only the code that
    # produced it — a changed query must sit in tier 0/1 even if it
    # was green before
    for n in _CHANGED_THIS_ROUND:
        assert _driver_tier(REGISTRY[n]) in (0, 1), n


def test_window_spent_entirely_on_unevidenced():
    # More unevidenced queries exist than the window holds (the round-3
    # surface grew past 50 new/changed entries), so the invariant is:
    # no window slot is wasted on an already-evidenced query while an
    # unevidenced one waits outside — evidence debt drains oldest-first
    # across rounds.
    names = list(REGISTRY)
    n_unevidenced = sum(
        1 for n, q in REGISTRY.items() if not _evidenced(n, q)
    )
    window = names[: min(DRIVER_WINDOW, n_unevidenced)]
    for n in window:
        assert not _evidenced(n, REGISTRY[n]), (
            f"evidenced {n} occupies a window slot while unevidenced "
            "queries wait outside"
        )


def test_stale_greens_reverify_oldest_first():
    # r4 verdict "Next round" #5: tier-2 re-verification slots go to
    # the OLDEST driver evidence first — an r1 green may never queue
    # behind an r3/r4 green.
    tier2 = [
        n for n, q in REGISTRY.items()
        if n not in _DRIVER_FIRST and _driver_tier(q) == 2
    ]
    rounds = [_EVIDENCE_ROUND[n] for n in tier2]
    assert rounds == sorted(rounds)


def test_evidence_ledger_consistent():
    # a name may hold at most one latest-evidence round, and every
    # evidenced name has one
    for n in _HASH_GREEN | _ROWS_SEEN:
        assert n in _EVIDENCE_ROUND, n
    assert not (_HASH_GREEN & _ROWS_SEEN)


def test_remaining_window_reverifies_oracle_greens():
    # slots left after the unevidenced queries go to RE-verifying
    # oracle-backed greens (not to rows-only repeats): inside the
    # window, no tier-3 entry may precede a tier-2 entry's absence
    names = list(REGISTRY)
    window = [_driver_tier(REGISTRY[n]) for n in names[:DRIVER_WINDOW]]
    outside = [_driver_tier(REGISTRY[n]) for n in names[DRIVER_WINDOW:]]
    if any(t == 3 for t in window):
        assert all(t == 3 for t in outside), (
            "rows-only repeats occupy window slots while oracle-backed "
            "queries wait outside"
        )
