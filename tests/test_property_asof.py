"""Property-based tests (hypothesis) for the union-merge as-of join
(operators/relational.py::asof_join) against independent references:
pandas.merge_asof for backward/forward, and a brute-force nearest
reference for the composed direction used by q_join_asof_nearest.

The bundled-data oracle checks pin one distribution; these pin the
operator on adversarial shapes hypothesis finds (empty sides, all-ties,
single-key pileups, times before/after every right row).
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from tmp_parquet_merge_spark.operators.relational import asof_join

# Small integer domains force collisions (shared keys, tied times).
_KEYS = st.integers(min_value=0, max_value=2)
_TIMES = st.integers(min_value=0, max_value=20)

_LEFT = st.lists(st.tuples(_KEYS, _TIMES), min_size=1, max_size=12)
# right side: unique (key, time) pairs so every engine's tie policy
# is irrelevant to the expected value
_RIGHT = st.lists(
    st.tuples(_KEYS, _TIMES), min_size=0, max_size=12, unique=True
)


def _spark_asof(spark, left, right, direction):
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid int, k int, t int"
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for (k, t) in right],
        "k int, rt int, val int",
    ).withColumn("__rt", F.col("rt"))
    out = asof_join(
        ldf,
        rdf,
        on="k",
        left_time="t",
        right_time="__rt",
        right_values=["val"],
        direction=direction,
    )
    return {r.lid: r.val for r in out.collect()}


def _pandas_asof(left, right, direction):
    ldf = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        columns=["lid", "k", "t"],
    ).sort_values("t", kind="stable")
    rdf = (
        pd.DataFrame(
            [(k, t, k * 1000 + t) for (k, t) in right],
            columns=["k", "rt", "val"],
        )
        .astype({"k": "int64", "rt": "int64", "val": "int64"})
        .sort_values("rt", kind="stable")
    )
    m = pd.merge_asof(
        ldf,
        rdf,
        left_on="t",
        right_on="rt",
        by="k",
        direction=direction,
    )
    return {
        int(r.lid): (None if pd.isna(r.val) else int(r.val))
        for r in m.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_LEFT, right=_RIGHT)
def test_asof_matches_pandas(spark, direction, left, right):
    assert _spark_asof(spark, left, right, direction) == _pandas_asof(
        left, right, direction
    )


def _nearest_reference(left, right):
    exp = {}
    for i, (k, t) in enumerate(left):
        best = None  # (distance, is_forward, val)
        for rk, rt in right:
            if rk != k:
                continue
            cand = (abs(rt - t), rt > t, rk * 1000 + rt)
            if best is None or cand[:2] < best[:2]:
                best = cand
        exp[i] = best[2] if best else None
    return exp


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_LEFT, right=_RIGHT)
def test_asof_nearest_composition_matches_bruteforce(spark, left, right):
    """The backward+forward recombine (q_join_asof_nearest's shape):
    closest right row in either direction, backward wins ties."""
    back = _spark_asof(spark, left, right, "backward")
    fwd = _spark_asof(spark, left, right, "forward")
    lt = {i: t for i, (_, t) in enumerate(left)}
    times = {(k * 1000 + t): t for (k, t) in right}
    got = {}
    for i in back:
        b, f = back[i], fwd[i]
        if b is None:
            got[i] = f
        elif f is None:
            got[i] = b
        else:
            b_gap = lt[i] - times[b]
            f_gap = times[f] - lt[i]
            got[i] = b if b_gap <= f_gap else f
    assert got == _nearest_reference(left, right)
