"""Driver-window registration order.

The correctness driver evaluates only the first 50 registry entries
per round, so insertion order IS evidence budget (queries.py's
_reorder_registry).  These tests pin the invariants: the window is
spent on queries that can yield NEW evidence this round, changed
queries are re-verified, and nothing is lost in the reshuffle.
"""

from tmp_parquet_merge_spark.queries import (
    REGISTRY,
    _CHANGED_THIS_ROUND,
    _R1_HASH_GREEN,
    _R1_ROWS_SEEN,
    _driver_tier,
)

DRIVER_WINDOW = 50


def test_registry_complete_and_unique():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 92  # round-1 surface never shrinks
    # every round-1 name still registered
    for n in _R1_HASH_GREEN | _R1_ROWS_SEEN | _CHANGED_THIS_ROUND:
        assert n in REGISTRY, n


def test_tiers_are_monotonic():
    tiers = [_driver_tier(q) for q in REGISTRY.values()]
    assert tiers == sorted(tiers)


def test_window_holds_all_new_evidence():
    names = list(REGISTRY)
    window = set(names[:DRIVER_WINDOW])
    # every oracle-backed query without round-1 hash evidence, and every
    # changed query, sits inside the driver's evaluation window
    for n, q in REGISTRY.items():
        needs_evidence = (
            n in _CHANGED_THIS_ROUND
            or (q.oracle is not None and n not in _R1_HASH_GREEN)
        )
        if needs_evidence:
            assert n in window, f"{n} needs driver evidence but is past slot 50"


def test_window_not_wasted_on_old_rows_only():
    names = list(REGISTRY)
    for n in names[:DRIVER_WINDOW]:
        q = REGISTRY[n]
        wasted = (
            q.oracle is None
            and n in _R1_ROWS_SEEN
            and n not in _CHANGED_THIS_ROUND
        )
        assert not wasted, f"slot wasted on already-recorded rows-only {n}"
