"""Corpus-curation operators: deterministic dataset splits.

A training-data pipeline must assign every document to
train/val/test *stably* — re-running the pipeline over a grown corpus
must never move an old document between splits (that leaks eval data
into training).  Random `df.sample` fails that; hashing the document id
gives a pure function of the row.

Spark-first: one scan-speed expression, no shuffle, no UDF.  The hash
is md5 (spelled identically in DuckDB, so the assignment itself is
oracle-checked) and the split decision is a lexicographic compare on
the first hex nibble — '0'..'9' < 'a'..'f' in ASCII, so 16 equal-mass
buckets split 13/2/1 ⇒ 81.25% / 12.5% / 6.25%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff the first
    two hex nibbles of ``md5(id)`` fall under its stratum's threshold
    (rate quantized to /256).  This is corpus mixing — downweight
    overrepresented sources to a target mixture — as a pure row
    function: scan-speed, shuffle-free, stable under corpus growth,
    and reproducible across engines (md5 + lexicographic hex compare).
    """

    def thresh(rate: float) -> str:
        n = max(0, min(256, round(rate * 256)))
        return format(n - 1, "02x") if n > 0 else ""

    nib = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    expr = None
    for stratum, rate in sorted(rates.items()):
        branch = F.when(F.col(strata_col) == stratum, F.lit(thresh(rate)))
        expr = branch if expr is None else expr.when(
            F.col(strata_col) == stratum, F.lit(thresh(rate))
        )
    cut = (
        expr.otherwise(F.lit(thresh(default_rate)))
        if expr is not None
        else F.lit(thresh(default_rate))
    )
    return df.filter(nib <= cut)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    *,
    budget: int,
    part_col: str | None = None,
) -> DataFrame:
    """Contiguous sequence packing: documents ordered by id are laid
    end-to-end into fixed-size token windows ("packs"); each document
    gets the pack holding its first token and its token offset inside
    that pack.  This is the batch shape of
    training-sequence packing — deterministic (no RNG), and a pure
    window computation: pack_id = floor(tokens_before / budget),
    pack_offset = tokens_before mod budget.

    Scale: a single global ordering would serialize on one partition,
    so ``part_col`` (e.g. the source/shard column) scopes the packing —
    each shard packs independently, exactly how a 100 TB corpus is
    packed per input shard in practice.  One shuffle on ``part_col``,
    one sorted pass per partition.
    """
    from pyspark.sql import Window

    part = F.col(part_col) if part_col else F.lit(0)
    w = (
        Window.partitionBy(part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    cols = [F.col(id_col)] + ([F.col(part_col)] if part_col else [])
    return df.select(
        *cols,
        F.col(token_col),
        F.floor(before / budget).cast("int").alias("pack_id"),
        (before % budget).cast("int").alias("pack_offset"),
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, *, k: int
) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    exponential-sort / A-ES scheme): each row gets the key
    ln(u) / w with u = md5-derived uniform in (0, 1], and the ``k``
    largest keys win — equivalent to sequential weighted draws, but a
    pure row function plus a top-k, so it is reproducible, stable
    under corpus growth, and engine-checkable (md5 + IEEE double
    arithmetic spell identically in DuckDB).

    Plan: scan-speed key computation (no UDF) →
    TakeOrderedAndProject top-k (per-partition heaps, single narrow
    collect of k rows) — no full sort, no wide shuffle at any scale.
    """
    # first 8 md5 hex chars → integer in [0, 2^32) → u in (0, 1]
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (h + 1) / F.lit(float(1 << 32))
    key = F.log(u) / F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    return (
        df.withColumn("sample_key", F.round(key, 9))
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )


def split_assign(df: DataFrame, id_col: str) -> DataFrame:
    """Assign each row to train/val/test by the first hex nibble of
    ``md5(id)``: nibbles 0–c → train (13/16), d–e → val (2/16),
    f → test (1/16).  Deterministic, shuffle-free, oracle-checkable."""
    nib = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return df.select(
        F.col(id_col),
        F.when(nib <= "c", "train")
        .when(nib <= "e", "val")
        .otherwise("test")
        .alias("split"),
    )
