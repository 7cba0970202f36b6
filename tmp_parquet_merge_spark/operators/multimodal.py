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


def _ball_masks(width: int, f: int) -> list[int]:
    """All XOR masks of popcount ≤ ``f`` over ``width`` bits — the
    Hamming ball a multi-index probe enumerates (|ball| = Σ C(width,k)
    for k ≤ f; 137 for width=16, f=2)."""
    import itertools

    masks = [0]
    for k in range(1, f + 1):
        for pos in itertools.combinations(range(width), k):
            masks.append(sum(1 << p for p in pos))
    return masks


def media_neardup_pairs(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    radius: int = 10,
    bands: int = 4,
) -> DataFrame:
    """Perceptual near-duplicate media pairs: blockhash signatures →
    multi-index Hamming-ball candidate join → exact verify ≤ ``radius``.

    EXACT by construction for ANY band count (generalized pigeonhole:
    if the total 64-bit distance is ≤ radius, at least one of the
    ``bands`` disjoint substrings carries ≤ ⌊radius/bands⌋ of the
    errors) — this is multi-index hashing (Norouzi, Punjani & Fleet,
    "Fast Search in Hamming Space with Multi-Index Hashing", CVPR
    2012): each item indexes ONE key per band, and probes the Hamming
    ball of radius f = ⌊radius/bands⌋ around its own band value.  The
    r11 spelling was the f=0 degenerate case (bands=11 1-key bands of
    5.8 bits), whose background candidate density measured 36% of ALL
    pairs on the bundled corpus — banding barely filtered, and the
    25× sweep's 17.99 ratio was that quadratic candidate relation.
    bands=4 (16-bit bands, f=2, 137-mask balls) measured 3.8% on the
    same corpus: 11.7× fewer candidate rows at the 25× replica
    (3.4B → 291M) for identical output, at the price of a 548-key
    probe-side explode per item.

    The probe explode must NOT be shuffled: 548 rows/item through an
    exchange costs more than the candidate savings (the r12 A/B:
    shuffled MIH 40 s vs the f=0 spelling's 28 s at the 25× replica;
    broadcast-index MIH 4.5 s).  When the index relation (n·bands
    3-int rows) fits a broadcast, ship IT and stream the probe side
    map-side — the index is ~1000× smaller than the probe relation.
    Above the broadcast budget the join falls back to shuffle, where
    MIH still wins once n² dominates (candidate volume scales n²,
    probe volume n) — the same auto-regime discipline as
    similarity.py's exact-scan switch.  Scale shape: one payload
    scan (signatures are 2 longs + ``bands`` ints per item); the
    broadcast path shuffles ONLY surviving matches; verify is JVM
    bit_count on the packed longs.  At open scale the residual knob
    is a longer signature (n_blocks=128/256 at fixed radius), which
    tightens the metric itself.

    Candidates are NOT deduped before the verify: a pair within f in
    k bands is verified k times (k ≤ bands) and deduped AFTER the
    Hamming filter, when only surviving pairs remain (the r11 A/B:
    pre-verify distinct cost 3.4 s of 7.9 s at sf0.1)."""
    import math

    if not 1 <= bands <= 64:
        raise ValueError(f"bands={bands} must be in [1, 64]")
    f = radius // bands
    bounds = [64 * k // bands for k in range(bands + 1)]
    widths = [e - s for s, e in zip(bounds, bounds[1:])]
    # size the ball ANALYTICALLY before enumerating — bands=1 would
    # ask for C(64, ≤10) ≈ 1.5e11 masks and hang inside the generator
    # if the guard came after
    n_masks = sum(
        math.comb(w, k) for w in widths for k in range(f + 1)
    )
    if n_masks > 20_000:
        raise ValueError(
            f"bands={bands}, radius={radius}: probe ball of "
            f"{n_masks} masks — use more bands"
        )
    ball = [_ball_masks(w, f) for w in widths]
    sigs = blockhash_signatures(
        media, id_col=id_col, payload_col=payload_col, bands=bands
    ).localCheckpoint(eager=False)
    # the checkpoint materializes here anyway on first use; counting
    # it decides the join regime (broadcast index vs shuffle) without
    # a second payload scan
    n_items = sigs.count()
    small_index = n_items * bands <= 8_000_000
    keys = sigs.select(
        F.col(id_col), F.posexplode("bands").alias("band", "bval")
    )
    # probe side: every key within Hamming f of the item's band value,
    # enumerated as literal XOR masks (JVM-side explode + int xor —
    # no Python).  ONE nested-list lit, not per-element F.lit()s — a
    # 16-bit f=2 ball is 137 masks/band and each F.lit is a py4j
    # round-trip, so element-wise construction costs thousands of
    # driver calls before the plan even exists.
    masks_lit = F.lit(ball)
    probes = keys.select(
        F.col(id_col),
        "band",
        "bval",
        F.explode(F.element_at(masks_lit, F.col("band") + 1)).alias("m"),
    ).select(
        F.col(id_col),
        "band",
        F.expr("bval ^ m").alias("bval"),
    ) if f > 0 else keys
    cand = (
        probes.alias("a")
        .join(
            F.broadcast(keys.alias("b")) if small_index else keys.alias("b"),
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
    if small_index:
        # the verify joins feed the CANDIDATE relation (the big side)
        # against the 2-long-per-item signature table — same regime
        sa, sb = F.broadcast(sa), F.broadcast(sb)
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
