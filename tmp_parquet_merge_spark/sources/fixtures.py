"""Reference-derived fixture generators (FIXTURES.md §A).

The reference's only "compute" is deterministic generator functions
written then asserted on read (SURVEY.md §2.D).  We regenerate the same
patterns with Spark expressions over ``spark.range`` — fully
distributed, no driver-side data materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def alltypes_df(spark: SparkSession, n: int = 500) -> DataFrame:
    """The 8-physical-type roundtrip table.

    Generators per reference: bool ``i%2==0`` (reader-writer.cc:80),
    int32 ``i`` (:88), repeated int64 ``[2i, 2i+1]``
    (reader-writer2.cc:115-121), int96→timestamp, float ``i*1.1``
    (:121), double ``i*1.1111111`` (:129), nullable string
    ``"parquet%03d"`` on even rows / NULL odd (:136-151), 10-byte
    fixed binary ``chr(i%256)*10`` (:156-163).
    """
    i = F.col("id")
    return spark.range(n).select(
        (i % 2 == 0).alias("boolean_field"),
        i.cast("int").alias("int32_field"),
        F.array(2 * i, 2 * i + 1).alias("int64_field"),
        F.timestamp_seconds(i).alias("int96_field"),
        (i * 1.1).cast("float").alias("float_field"),
        (i * 1.1111111).alias("double_field"),
        F.when(
            i % 2 == 0, F.concat(F.lit("parquet"), F.lpad(i.cast("string"), 3, "0"))
        ).alias("ba_field"),
        F.unhex(
            F.repeat(F.lpad(F.hex((i % 256).cast("int")), 2, "0"), 10)
        ).alias("flba_field"),
    )


def int_str_df(spark: SparkSession) -> DataFrame:
    """The Arrow-interface minimal table (parquet-arrow/src/
    reader-writer.cc:27-46): int64 [1..5] × string."""
    rows = list(zip([1, 2, 3, 4, 5], ["some", "string", "content", "in", "rows"]))
    return spark.createDataFrame(rows, "int: bigint, str: string")


def size_bands_df(spark: SparkSession) -> DataFrame:
    """Static interval-band dimension for range-join demos."""
    return spark.createDataFrame(
        [(0, 10, "small"), (10, 25, "medium"), (25, 100, "large")],
        "lo: int, hi: int, band: string",
    )
