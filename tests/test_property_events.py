"""Property-based tests (hypothesis) for the event-log replay
operators (q_cdc_apply, q_sessionize) against pure-Python references
on random adversarial event streams — run through the REAL registered
builders on a generated events.parquet, so the product plan (not a
test copy of it) is what's pinned.

Adversarial shapes the bundled events table rarely produces densely:
timestamp COLLISIONS on one user (the event_id tie-break carries the
whole last-writer decision), gaps of EXACTLY the 30-minute session
boundary (``ts > prev + 30min`` is strict — an exact-1800 s gap stays
in-session), users whose final operation is a delete, and single-event
users.  Timestamps step in 15-minute units so boundary gaps occur
constantly.
"""

import datetime
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tmp_parquet_merge_spark.queries import REGISTRY

_T0 = datetime.datetime(2025, 1, 1)
_TYPES = ["signup", "error", "click", "view"]
# (user, 15-min step offset, type, value)
_EVENTS = st.lists(
    st.tuples(
        st.integers(1, 2),
        st.integers(0, 12),
        st.sampled_from(_TYPES),
        st.integers(-5, 5),
    ),
    min_size=1,
    max_size=14,
)


def _write_events(rows):
    """events.parquet with the driver-testdata schema (µs timestamps)."""
    d = tempfile.mkdtemp(prefix="prop_events_")
    tab = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tab, os.path.join(d, "events.parquet"))
    return d


def _mk_rows(events):
    return [
        (eid, _T0 + datetime.timedelta(seconds=900 * off), u, ty, float(v))
        for eid, (u, off, ty, v) in enumerate(events)
    ]


def _ref_cdc(rows):
    """Last-writer-wins by (ts, event_id); final delete -> no row."""
    out = {}
    for eid, ts, u, ty, v in rows:
        cur = out.get(u)
        if cur is None or (ts, eid) > (cur[0], cur[1]):
            out[u] = (ts, eid, ty, v)
    return {
        u: (round(v, 6), ts)
        for u, (ts, eid, ty, v) in out.items()
        if ty != "error"  # op D
    }


def _ref_sessions(rows):
    """30-min strict-gap sessionization: per user ordered by
    (ts, event_id), new session when ts > prev_ts + 1800 s."""
    byu = {}
    for eid, ts, u, ty, v in rows:
        byu.setdefault(u, []).append((ts, eid))
    out = {}
    for u, evs in byu.items():
        evs.sort()
        seq = 0
        prev = None
        cur = []
        sessions = []
        for ts, eid in evs:
            if prev is None or ts > prev + datetime.timedelta(seconds=1800):
                if cur:
                    sessions.append(cur)
                cur = []
            cur.append(ts)
            prev = ts
        sessions.append(cur)
        for i, s in enumerate(sessions, start=1):
            out[(u, i)] = (
                len(s),
                min(s),
                max(s),
                int((max(s) - min(s)).total_seconds()),
            )
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_EVENTS)
def test_cdc_and_sessionize_match_reference(spark, events):
    rows = _mk_rows(events)
    d = _write_events(rows)

    got_cdc = {
        r.user_id: (r.last_value, r.last_ts)
        for r in REGISTRY["q_cdc_apply"].build(spark, d).collect()
    }
    assert got_cdc == _ref_cdc(rows)

    got_sess = {
        (r.user_id, r.session_seq): (
            r.n_events,
            r.session_start,
            r.session_end,
            r.duration_s,
        )
        for r in REGISTRY["q_sessionize"].build(spark, d).collect()
    }
    assert got_sess == _ref_sessions(rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 30)),
        min_size=1,
        max_size=18,
        unique=True,
    )
)
def test_islands_match_reference(spark, ids):
    """Gaps-and-islands on random sparse id sets: maximal consecutive
    event_id runs per user, pinned against a direct run-scan."""
    rows = [
        (eid, _T0, u, "click", 0.0) for u, eid in sorted(set(ids))
    ]
    d = _write_events(rows)
    got = [
        (r.user_id, r.island_start, r.island_end, r.island_len)
        for r in REGISTRY["q_islands"].build(spark, d).collect()
    ]
    want = []
    byu = {}
    for u, eid in sorted(set(ids)):
        byu.setdefault(u, []).append(eid)
    for u in sorted(byu):
        run = []
        for eid in sorted(byu[u]):
            if run and eid == run[-1] + 1:
                run.append(eid)
            else:
                if run:
                    want.append((u, run[0], run[-1], len(run)))
                run = [eid]
        want.append((u, run[0], run[-1], len(run)))
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),
            st.integers(0, 8),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=16,
    )
)
def test_funnel_matches_reference(spark, events):
    """Ordered funnel semantics on adversarial orderings: stage k
    counts users whose first stage-(k-1) completion STRICTLY precedes
    some stage-k event — same-timestamp events do NOT chain (ts > t1
    is strict), purchases before clicks don't count, and the survivor
    sets shrink monotonically."""
    rows = [
        (eid, _T0 + datetime.timedelta(seconds=900 * off), u, ty, 0.0)
        for eid, (u, off, ty) in enumerate(events)
    ]
    d = _write_events(rows)
    got = {
        r.stage: r.n_users
        for r in REGISTRY["q_funnel"].build(spark, d).collect()
    }
    byu = {}
    for eid, ts, u, ty, v in rows:
        byu.setdefault(u, []).append((ts, ty))
    v = c = p = 0
    for u, evs in byu.items():
        t1 = min((ts for ts, ty in evs if ty == "view"), default=None)
        if t1 is None:
            continue
        v += 1
        t2 = min(
            (ts for ts, ty in evs if ty == "click" and ts > t1), default=None
        )
        if t2 is None:
            continue
        c += 1
        t3 = min(
            (ts for ts, ty in evs if ty == "purchase" and ts > t2),
            default=None,
        )
        if t3 is not None:
            p += 1
    assert got.get("view", 0) == v
    assert got.get("view > click", 0) == c
    assert got.get("view > click > purchase", 0) == p
