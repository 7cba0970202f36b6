"""Multimodal (image/audio/video) column handling.

North-star mandated (BASELINE.json).  Design: media travels as an
opaque ``binary`` payload column plus a typed metadata struct — the
layout that keeps a 100 TB multimodal table scannable (metadata-only
queries never touch payload bytes thanks to parquet column pruning).

The codec step is OPTIONAL-dependency gated: when PIL is importable,
``extract_features``/``decode_image`` decode real image bytes (pixel-
histogram features, ``decoded=True``); otherwise — and for payloads
that are not images — a deterministic byte-level fake runs, so the
family upgrades itself the moment the environment gains codecs, with
no code change.  The Spark-side plumbing is real and tested either
way: schema, Arrow batch shape, ``mapInPandas`` signatures, and the
partitioning story are exactly what a production decoder uses.

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
        # True when a real codec decoded the payload (PIL present and
        # the bytes parsed as an image); False = byte-level fallback
        T.StructField("decoded", T.BooleanType(), False),
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
    """Real decoder entry point: decodes ``payload`` with PIL when the
    library is importable (r5 verdict #6 — the family upgrades itself
    when the environment gains codecs, no code change), else raises
    NotImplementedError and extract_features uses the deterministic
    byte-level fake."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs (PIL) are not available in this environment; "
            "extract_features uses the deterministic byte-level fake "
            "instead"
        ) from exc
    import io

    return Image.open(io.BytesIO(payload))


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
    # imports), so the featurizer is defined inside.  Real-codec path
    # first: when PIL is importable AND the payload parses as an
    # image, features are a grayscale pixel histogram of the decoded
    # 16×16 thumbnail; otherwise the deterministic byte-histogram
    # fallback (vectorized frombuffer + bincount — a per-byte Python
    # loop makes the featurizer the bottleneck, ~100× at media payload
    # sizes).  The codec import is attempted once per batch iterator,
    # not per row.
    def featurize(payload: bytes, nbins: int, image_cls) -> tuple[list[float], bool]:
        import io

        import numpy as np

        if payload and image_cls is not None:
            try:
                img = image_cls.open(io.BytesIO(payload))
                img = img.convert("L").resize((16, 16))
                a = np.asarray(img, dtype=np.int32).ravel()
                hist = np.bincount(a * nbins // 256, minlength=nbins)
                return (hist / a.size).tolist(), True
            except Exception:
                pass  # not an image (or truncated) -> byte fallback
        if not payload:
            return [0.0] * nbins, False
        a = np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
        hist = np.bincount(a * nbins // 256, minlength=nbins)
        return (hist / len(payload)).tolist(), False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image as image_cls
        except ImportError:
            image_cls = None
        for pdf in batches:
            out = [featurize(p, bins, image_cls) for p in pdf["payload"]]
            feats = [f for f, _ in out]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "byte_entropy_bin": [
                        int(max(range(len(f)), key=f.__getitem__)) for f in feats
                    ],
                    "features": feats,
                    "decoded": [d for _, d in out],
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


def blockhash_signatures(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_blocks: int = 64,
    bands: int = 11,
) -> DataFrame:
    """Perceptual blockhash-gradient signature over a binary payload
    (public technique: blockhash.io / Yang et al. 2006 block mean
    value hashing, with the dHash gradient comparison of Krawetz):
    the payload's hex spelling is cut into ``n_blocks`` equal blocks,
    each block scored by its count of high-nibble hex chars (chars
    not in [0-7] — i.e. bytes' high bits), and bit b = 1 iff
    score(b) > score(b+1 mod n_blocks).  Byte-level stand-in for the
    decoded-pixel version, same contract as the rest of this module:
    swap the score for a block mean over decoded pixels without
    touching the banding/verify plumbing.

    Returns one row per media item: (id, lo, hi, bands) where lo/hi
    pack bits 0-31 / 32-63 into non-negative longs (Hamming distance
    = bit_count(lo^lo') + bit_count(hi^hi'), pure JVM int ops) and
    ``bands`` splits the 64 bits into ``bands`` disjoint bucket keys.
    PIGEONHOLE GUARANTEE: two signatures within Hamming distance
    bands-1 share at least one equal band, so a band-equality join is
    an EXACT candidate generator for radius ≤ bands-1 — no S-curve,
    no recall bet (the same argument q_dedup_simhash relies on).

    Computed as one Arrow-batched pandas UDF over the single payload
    scan (the module's batch-the-codec pattern; per-payload work is
    vectorized numpy nibble counting).  The first spelling was pure
    built-in expressions — transform/aggregate over hex(payload) —
    but higher-order functions run interpreted and CollapseProject
    re-inlines the hex() into all 64 block expressions, which
    measured 3.7 s at sf0.1 vs 0.8 s for this spelling (bit-identical,
    equality test-pinned).  The SEMANTICS are unchanged and stay
    closed-form over hex(payload) for the DuckDB oracle: score(b) =
    count of hex chars ≥ '8' (i.e. nibbles ≥ 8) in hex positions
    [⌊H·b/64⌋, ⌊H·(b+1)/64⌋).  The payload never survives past this
    projection."""
    if n_blocks != 64:
        raise ValueError("packing assumes a 64-bit signature")
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bounds = [64 * k // bands for k in range(bands + 1)]

    @pandas_udf("struct<lo: long, hi: long, bands: array<int>>")
    def _sig(payload: pd.Series) -> pd.DataFrame:
        los, his, bandvals = [], [], []
        w32 = np.arange(32)
        for p in payload:
            b = np.frombuffer(p, dtype=np.uint8)
            # hex chars of p = interleaved (high, low) nibbles
            nib = np.empty(2 * len(b), dtype=np.uint8)
            nib[0::2] = b >> 4
            nib[1::2] = b & 15
            high = (nib >= 8).astype(np.int64)
            H = len(nib)
            cs = np.concatenate([[0], np.cumsum(high)])
            idx = (H * np.arange(65)) // 64
            m = cs[idx[1:]] - cs[idx[:-1]]  # per-block scores
            bits = (m > np.roll(m, -1)).astype(np.int64)  # gradient
            los.append(int((bits[:32] << w32).sum()))
            his.append(int((bits[32:] << w32).sum()))
            bv = []
            for s, e in zip(bounds, bounds[1:]):
                acc = 0
                for x in bits[s:e]:
                    acc = acc * 2 + int(x)
                bv.append(acc)
            bandvals.append(bv)
        return pd.DataFrame({"lo": los, "hi": his, "bands": bandvals})

    return (
        media.filter(F.col(payload_col).isNotNull())
        .select(F.col(id_col), _sig(F.col(payload_col)).alias("s"))
        .select(F.col(id_col), "s.lo", "s.hi", "s.bands")
    )


def media_neardup_pairs(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    radius: int = 10,
    bands: int = 11,
) -> DataFrame:
    """Perceptual near-duplicate media pairs: blockhash signatures →
    band-equality candidate join → exact Hamming verify ≤ ``radius``.

    EXACT by construction when ``bands > radius`` (pigeonhole — see
    :func:`blockhash_signatures`), so the output is deterministic and
    oracle-able, unlike threshold-LSH.  Scale shape: the payload scan
    happens once (signatures are 2 longs + ``bands`` ints per item);
    the only corpus-wide shuffles carry (band, key, id) ints and the
    candidate id pairs; Hamming verify is JVM bit_count on packed
    longs.  Candidate volume is n²·bands/2^(64/bands) on random
    payloads — at open scale tighten the radius (more bits per band)
    or lengthen the signature (n_blocks=128/256) rather than betting
    on sparseness; both knobs keep the pigeonhole guarantee.

    Candidates are NOT deduped before the verify: a pair colliding in
    k bands is verified k times (k ≤ bands) and deduped AFTER the
    Hamming filter, when only surviving pairs remain.  The verify is
    two int XORs + bit_counts, so paying it ≤ bands× is far cheaper
    than a corpus-wide distinct on the raw candidate relation — the
    pre-verify distinct measured 3.4 s of the query's 7.9 s at sf0.1
    (the A/B that set the r11 floor); the post-filter distinct
    shuffles only matches × multiplicity rows."""
    if bands <= radius:
        raise ValueError(
            f"bands={bands} must exceed radius={radius} for the "
            "pigeonhole candidate guarantee"
        )
    sigs = blockhash_signatures(
        media, id_col=id_col, payload_col=payload_col, bands=bands
    ).localCheckpoint(eager=False)
    keys = sigs.select(
        F.col(id_col), F.posexplode("bands").alias("band", "bval")
    )
    cand = (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("media_a"),
            F.col(f"b.{id_col}").alias("media_b"),
        )
    )
    sa = sigs.select(
        F.col(id_col).alias("media_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    sb = sigs.select(
        F.col(id_col).alias("media_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    return (
        cand.join(sa, "media_a")
        .join(sb, "media_b")
        .select(
            "media_a",
            "media_b",
            F.expr(
                "CAST(bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b) "
                "AS BIGINT)"
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= radius)
        .distinct()
    )
