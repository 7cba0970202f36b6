"""Multimodal (image/audio/video) column handling.

North-star mandated (BASELINE.json).  Design: media travels as an
opaque ``binary`` payload column plus a typed metadata struct — the
layout that keeps a 100 TB multimodal table scannable (metadata-only
queries never touch payload bytes thanks to parquet column pruning).

The actual codec step (JPEG decode, audio resample, video frame
sample) needs libraries this container doesn't ship, so codecs are
STUBBED behind ``NotImplementedError`` with a deterministic fake
(byte-level features) — but the Spark-side plumbing is real and
tested: schema, Arrow batch shape, ``mapInPandas`` signatures, and
the partitioning story are exactly what a real decoder drops into.

Scale notes: feature extraction is ``mapInPandas`` (Arrow-batched, no
per-row Python), embarrassingly parallel, no shuffle; payload bytes
stream through executors once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), False),
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy_bin", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from the documents corpus: UTF-8 bytes
    as payload + typed metadata.  Stand-in for `spark.read.format(
    "binaryFile")` over an object store, which yields the same shape
    (path/length/content)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain;fake-image").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder entry point — requires PIL/libjpeg, absent here."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "extract_features uses the deterministic byte-level fake instead"
    )


def _fake_features(payload: bytes, bins: int = 16) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector: a
    normalized byte histogram (vectorized — a per-byte Python loop
    would make the featurizer the pipeline bottleneck).  Replace with
    (decode → resize → model) without touching the Spark plumbing."""
    import numpy as np

    if not payload:
        return [0.0] * bins
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
    hist = np.bincount(a * bins // 256, minlength=bins)
    return (hist / len(payload)).tolist()


def extract_features(media: DataFrame, *, bins: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` keeps whole Arrow record batches in Python — the
    shape a real decoder wants (batch the codec, not the rows).  Output
    drops the payload so downstream stages shuffle features, not bytes.
    """

    # self-contained closure: executor workers may not have this repo
    # importable (cloudpickle serializes module-level functions as
    # imports), so the stub featurizer is defined inside.  Vectorized:
    # frombuffer + bincount per payload — a per-byte Python loop makes
    # the featurizer the bottleneck (~100× at media payload sizes).
    def featurize(payload: bytes, nbins: int) -> list[float]:
        import numpy as np

        if not payload:
            return [0.0] * nbins
        a = np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
        hist = np.bincount(a * nbins // 256, minlength=nbins)
        return (hist / len(payload)).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [featurize(p, bins) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "byte_entropy_bin": [
                        int(max(range(len(f)), key=f.__getitem__)) for f in feats
                    ],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing demo: one output row per sampled
    offset of each payload (video → frames explodes the same way).
    Pure JVM: posexplode over a sequence of offsets, substring into the
    binary — no Python at all."""
    n = F.col("meta.n_bytes")
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)),
        1,
        max_frames,
    )
    return media.select(
        "media_id",
        "payload",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    ).select(
        "media_id",
        "frame_idx",
        "byte_offset",
        F.col("payload").substr(F.col("byte_offset") + 1, F.lit(16)).alias("frame_bytes"),
    )
