"""Z-order (Morton) clustered writes — multi-dimensional data skipping.

A single-column sort gives row-group min/max pruning on that column
only; every other dimension's min/max spans the full range in every
group.  Interleaving the bits of two normalized dimensions and sorting
by the interleaved code keeps BOTH dimensions' per-row-group spans
narrow, so point/range predicates on either column skip most groups —
the standard lake-layout trick (Delta/Iceberg OPTIMIZE ZORDER) built
here from plain Spark expressions:

  * normalize each dimension to 16 bits by min/max scaling (bounds ride
    as a broadcast 1-row aggregate — no driver action, no second scan;
    rank-based bucketing via approxQuantile boundaries slots in for
    skewed dimensions without changing the plan shape),
  * spread the bits with the classic shift/mask ladder (all JVM
    bitwise ops, whole-stage codegen),
  * range-repartition + sort by the 32-bit code, write with bounded
    row-group size.

Effectiveness is asserted in tests by counting candidate row groups
(footer min/max from sources.parquet_io.column_stats) for a secondary-
dimension predicate: z-order must beat a primary-sorted layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread16(x: Column) -> Column:
    """Interleave-ready bit spread: 16-bit value -> 32 bits with a zero
    between consecutive bits (Morton magic-number ladder)."""
    x = x.cast("long")
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def morton_code(x16: Column, y16: Column) -> Column:
    """32-bit Morton code of two 16-bit normalized dimensions."""
    return _spread16(x16).bitwiseOR(F.shiftleft(_spread16(y16), 1))


def zorder_write(
    df: DataFrame,
    cols: tuple[str, str],
    out_path: str,
    *,
    num_files: int = 4,
    block_size_bytes: int = 1024 * 1024,
) -> DataFrame:
    """Write ``df`` z-ordered on two numeric columns; returns read-back.

    The min/max bounds broadcast-join onto the scan, the Morton code is
    pure bitwise codegen, and the sort is a range exchange on the code
    (balanced at any scale).  Row groups are kept small via
    ``parquet.block.size`` so footer min/max pruning has granularity.
    """
    a, b = cols
    bounds = df.agg(
        F.min(a).alias("__amin"),
        F.max(a).alias("__amax"),
        F.min(b).alias("__bmin"),
        F.max(b).alias("__bmax"),
    )

    def norm16(c: str, lo: str, hi: str) -> Column:
        span = F.col(hi) - F.col(lo)
        unit = (F.col(c) - F.col(lo)) / F.when(span == 0, 1).otherwise(span)
        return F.least(F.floor(unit * 65535), F.lit(65535)).cast("long")

    coded = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__z", morton_code(norm16(a, "__amin", "__amax"), norm16(b, "__bmin", "__bmax"))
    )
    (
        coded.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__amin", "__amax", "__bmin", "__bmax", "__z")
        .write.mode("overwrite")
        .option("parquet.block.size", block_size_bytes)
        .parquet(out_path)
    )
    return df.sparkSession.read.parquet(out_path)
