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
