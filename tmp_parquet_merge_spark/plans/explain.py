"""Physical-plan introspection — the engine's scale-assurance tooling.

The reference exposes storage-level knobs (column projection, row-group
skipping); in Spark those are Catalyst behaviors visible only in the
physical plan.  These helpers make them assertable in tests so a
regression that un-pushes a filter or de-broadcasts a dim join fails CI
instead of melting a 1000-executor cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the Parquet scan (PushedFilters: [...])."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from Parquet (ReadSchema) — column-pruning
    proof, the analog of the reference's ordinal projection."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1)
        cols.extend(p.split(":")[0].strip() for p in body.split(",") if p.strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)
