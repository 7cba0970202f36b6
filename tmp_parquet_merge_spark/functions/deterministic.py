"""Deterministic aggregation helpers.

Distributed sums of IEEE doubles are order-dependent: Spark sums
per-partition then merges, DuckDB (the driver's oracle) sums in its own
order, so the last bits differ and order-insensitive value-hashes
mismatch. Convention used by every declared query (SURVEY.md §7
"DuckDB oracle hash-matching"):

    * cast each double operand to DECIMAL(18,6) *before* aggregating —
      decimal addition is exact, hence order-independent;
    * cast the aggregate result back to DOUBLE — a single deterministic
      rounding, identical in both engines.

The matching oracle-SQL spelling is
``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)``.

Per-row double arithmetic (e.g. ``p * (1 - d)``) is deterministic as
long as both sides evaluate the same expression tree, so it stays in
double and only the aggregation boundary goes through decimal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec6(col: Column | str) -> Column:
    """Cast to the exact-summation type DECIMAL(18,6)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(dec6(col)).cast("double")


def dsum_expr(expr: Column) -> Column:
    """Order-independent sum of a per-row double expression."""
    return F.sum(expr.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic mean: exact decimal sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec6(c)).cast("double") / F.count(c)
