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
    _HASH_GREEN,
    _ROWS_SEEN,
    _driver_tier,
)

DRIVER_WINDOW = 50


def test_registry_complete_and_unique():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 101  # round-2 surface never shrinks
    # every name in the evidence ledger still registered
    for n in _HASH_GREEN | _ROWS_SEEN | _CHANGED_THIS_ROUND:
        assert n in REGISTRY, n


def test_tiers_are_monotonic():
    tiers = [_driver_tier(q) for q in REGISTRY.values()]
    assert tiers == sorted(tiers)


def test_changed_queries_always_requeued():
    # the advisor's rule: evidence certifies only the code that
    # produced it — a changed query must sit in tier 0/1 even if it
    # was green before
    for n in _CHANGED_THIS_ROUND:
        assert _driver_tier(REGISTRY[n]) in (0, 1), n


def test_window_holds_all_unevidenced():
    names = list(REGISTRY)
    window = set(names[:DRIVER_WINDOW])
    for n, q in REGISTRY.items():
        evidenced = (
            n in (_HASH_GREEN if q.oracle is not None else _ROWS_SEEN)
            and n not in _CHANGED_THIS_ROUND
        )
        if not evidenced:
            assert n in window, f"{n} needs driver evidence but is past slot 50"


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
