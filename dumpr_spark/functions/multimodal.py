"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched pandas iterators (mapInPandas).

The Spark-side contract (schemas, partitioning, batch shapes) is real and
tested; the actual media decode is STUBBED — the codec libraries (Pillow,
torchaudio, av) are not in this container. Each stub is deterministic so
pipelines are testable end-to-end; swap `_decode_stub` for a real decoder in
deployment without touching the Spark plumbing.
"""

from __future__ import annotations

import functools
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

# Canonical multimodal asset schema: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),  # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),  # audio/video
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake assets for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        rows.append(
            (i, mt, payload, f"application/x-fake-{mt}", 64 if mt != "audio" else None,
             48 if mt != "audio" else None, None if mt == "image" else 1000 + i)
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _decode_stub(payload: bytes, media_type: str) -> list[float]:
    """Deterministic fake 'decode + feature-extract' (the container fallback:
    codec libraries are absent here). Derives an 8-dim feature from the
    payload hash so the distributed plumbing (batching, schema, nullability)
    is fully exercised. `_decode_image_real` below is the real image path,
    used automatically when Pillow is importable and the bytes decode.
    """
    if payload is None:
        return None
    h = hashlib.sha256(payload + media_type.encode()).digest()
    return [b / 255.0 for b in h[:8]]


@functools.lru_cache(maxsize=1)
def _pillow():
    """Resolve Pillow ONCE per process: a failed `from PIL import Image`
    is not cached by Python, so probing per row would pay a full sys.path
    scan for every image row in the hot mapInPandas path when Pillow is
    absent (the normal state in this container)."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _decode_image_real(payload: bytes) -> list[float] | None:
    """Real image decode via Pillow, when available: decode -> grayscale ->
    resize to a 4x2 grid -> normalized pixels. Same shape (8-dim
    array<float>) and schema as the stub, so stub and real paths are
    interchangeable batch-for-batch. Returns None when Pillow is absent or
    the bytes are not a decodable image (caller falls back to the stub —
    corrupt inputs degrade, they don't kill the executor)."""
    Image = _pillow()
    if Image is None:
        return None
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            px = list(im.convert("L").resize((4, 2)).getdata())
        return [p / 255.0 for p in px]
    except Exception:
        return None


def _decode(payload: bytes, media_type: str) -> list[float]:
    if payload is None:
        return None
    if media_type == "image":
        real = _decode_image_real(payload)
        if real is not None:
            return real
    return _decode_stub(payload, media_type)


def extract_features(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, one python worker per
    partition, constant memory per batch. At scale: repartition upstream so
    payload bytes per partition fit executor memory.

    Image payloads decode for real when Pillow is importable on the executor
    (optional dependency); everything else — and undecodable bytes — takes
    the deterministic stub, under the identical FEATURE_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else None),
                    "feature": [
                        _decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )
            yield out

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode
    (asset_id, frame_ts_ms). Pure relational expansion — the decode itself
    would consume this plan via extract_features. Demonstrates the
    explode-based fan-out shape for multimodal pipelines."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        assets.where(F.col("media_type") == "video")
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_idx"),
        )
        .select("asset_id", (F.col("frame_idx") * every_ms).cast("long").alias("frame_ts_ms"))
    )


def audio_window_plan(
    assets: DataFrame, window_ms: int = 2000, stride_ms: int = 1000
) -> DataFrame:
    """Audio windowing *plan*: one row per overlapping analysis window
    (asset_id, win_start_ms, win_len_ms) — the audio twin of
    frame_sample_plan and the waveform analog of text chunking (same
    tail-covering start grid: the last window may be partial, nothing is
    dropped while stride <= window). A decode/feature stage consumes this
    plan via extract_features-style mapInPandas."""
    dur = F.col("duration_ms")
    last_start = F.greatest(dur - window_ms + stride_ms, F.lit(0)).cast("long")
    starts = F.sequence(F.lit(0).cast("long"), last_start, F.lit(stride_ms).cast("long"))
    return (
        assets.where(F.col("media_type") == "audio")
        .select("asset_id", "duration_ms", F.explode(starts).alias("win_start_ms"))
        .where(F.col("win_start_ms") < dur)
        .select(
            "asset_id",
            F.col("win_start_ms").cast("long").alias("win_start_ms"),
            F.least(F.lit(window_ms), dur - F.col("win_start_ms")).cast("long").alias("win_len_ms"),
        )
    )


def _ahash_stub(payload: bytes) -> tuple[str, int, float]:
    """Deterministic fake 8x8 luma grid for the container without codecs:
    the 64 hex digits of sha256(payload || 'luma') stand in for the 64
    downsampled pixels (each 0..15). The average-hash math downstream is
    the REAL algorithm — only the pixel source is stubbed, and because it
    is a hash the SQL oracle replays it bit-for-bit."""
    h = hashlib.sha256(payload + b"luma").hexdigest()
    digits = [int(c, 16) for c in h]
    return _ahash_of(digits, 15.0)


def _ahash_of(pixels: list, maxval: float) -> tuple[str, int, float]:
    """Average hash of a 64-pixel luma grid: bit_i = (pixel_i >= mean),
    packed big-endian into 16 hex chars. The integer compare 64*p >= sum
    avoids ever forming the float mean, so every engine draws the same
    bits. Returns (ahash_hex, bits_set, mean_luma in [0, 1] rounded 4dp)."""
    s = sum(pixels)
    bits = [1 if 64 * p >= s else 0 for p in pixels]
    nibbles = [
        8 * bits[j] + 4 * bits[j + 1] + 2 * bits[j + 2] + bits[j + 3]
        for j in range(0, 64, 4)
    ]
    ahash = "".join("0123456789abcdef"[n] for n in nibbles)
    return ahash, sum(bits), round(s / (64.0 * maxval) + 1e-9, 4)


def _ahash_image_real(payload: bytes) -> tuple[str, int, float] | None:
    """Real average hash when Pillow can decode the bytes: grayscale ->
    8x8 resize -> the same packing as the stub. None on absent codec or
    undecodable bytes (caller falls back to the stub)."""
    Image = _pillow()
    if Image is None:
        return None
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            px = list(im.convert("L").resize((8, 8)).getdata())
        return _ahash_of(px, 255.0)
    except Exception:
        return None


AHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("ahash", StringType()),
        StructField("bits_set", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def ahash_images(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Perceptual fingerprints (average hash) for image payloads via
    Arrow-batched mapInPandas — the image analog of text fingerprinting:
    64-bit aHash for near-dup blocking (hamming-close hashes = visually
    close images), bits_set and mean-luma as cheap quality screens.

    Scale shape: a narrow map over the image scan (payload bytes never
    shuffle — the output is 16 hex chars + two scalars per image);
    near-dup search then bands the 64 bits exactly like dedup_simhash
    (pigeonhole: hamming <= 3 pairs share one of 4 16-bit bands). Real
    decode via Pillow when importable; the deterministic sha256-grid
    stub otherwise, same schema (the container default — tested plumbing,
    replayable oracle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if p is None:
                    rows.append((aid, None, None, None))
                    continue
                got = _ahash_image_real(p) or _ahash_stub(p)
                rows.append((aid, *got))
            yield pd.DataFrame(
                rows, columns=["asset_id", "ahash", "bits_set", "mean_luma"]
            )

    return assets.where(F.col("media_type") == "image").mapInPandas(
        run, AHASH_SCHEMA
    )


def ahash_sig64(ahash_col):
    """16-hex-char aHash -> the signed 64-bit long the SimHash banding
    machinery consumes. Combined from two 32-bit halves because
    F.conv returns a DECIMAL STRING — a single 16-char parse overflows
    the long cast for hashes with the top bit set (silent NULL); the
    hi<<32 wrap into the sign bit is intended (full 64-bit value, same
    convention as functions/dedup.simhash64)."""
    hi = F.conv(F.substring(ahash_col, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(ahash_col, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def ahash_near_dup_pairs(fingerprints: DataFrame, id_col: str = "asset_id",
                         ahash_col: str = "ahash",
                         max_hamming: int = 3) -> DataFrame:
    """Near-duplicate IMAGE pairs from aHash fingerprints — the search
    side of multimodal_image_ahash's promise: visually-close images have
    hamming-close average hashes, and hamming <= 3 pairs share one of 4
    16-bit bands exactly (pigeonhole), so the candidate join is the same
    equi-join-with-perfect-recall as text SimHash. Delegates to
    `functions/dedup.simhash_band_candidates` on the hex hash re-read as
    a 64-bit signature — one banding machinery for text AND images.
    Returns (a, b, hamming) with a < b, filtered to max_hamming.

    NULL fingerprints (ahash_images emits ahash=NULL for NULL payloads)
    are OUT OF SCOPE for the search and dropped EXPLICITLY here — without
    the filter they would vanish silently anyway (a NULL signature never
    matches a band equi-join), but a caller deduplicating a corpus with
    missing payloads should know those assets are absent from the pair
    list, not merely unpaired.

    Scale shape inherited: fingerprints shuffle once on (band, value);
    payload bytes were already left behind at fingerprint time."""
    from dumpr_spark.functions.dedup import simhash_band_candidates

    sigs = fingerprints.where(F.col(ahash_col).isNotNull()).select(
        F.col(id_col), ahash_sig64(F.col(ahash_col)).alias("sh64")
    )
    return simhash_band_candidates(
        sigs, id_col=id_col, sig_col="sh64", max_hamming=max_hamming
    )


def ahash_near_dup_pairs_scaled(
    assets: DataFrame, id_col: str = "asset_id",
    max_hamming: int = 3, max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Duplicate-heavy-safe image near-dup search — the 100 TB shape and
    the image-side mirror of `dedup.minhash_lsh_pairs_scaled` (the r9
    sf1-local run MEASURED the plain form's failure mode: identical
    payloads collide on every band, so pair volume went 168 -> 99,330 —
    591x at 10x docs — C(c,2) per c-copy group).

    Three stages, each linear in its input:
    1. EXACT-PAYLOAD PREPASS (multimodal_payload_dedup's md5 machinery):
       group identical payload bytes, collapse each group to its min-id
       representative; copies leave as (copy -> rep, hamming=0) edges —
       exact for free, identical bytes hash identically under any codec.
       The 16-byte md5 is computed beside the scan; payload bytes never
       shuffle.
    2. aHash fingerprints over REPRESENTATIVES ONLY (`ahash_images` —
       real Pillow decode when importable, the sha256-grid stub here).
    3. CAPPED banding over the distinct fingerprints
       (`dedup.simhash_band_candidates_scaled`): pigeonhole-exact recall
       at hamming <= `max_hamming`, with any residual degenerate bucket
       (a large visually-near-identical cluster under real decode)
       bounded by `max_bucket_size`.

    Returns (a, b, hamming): copy->rep edges (a > b, hamming 0) unioned
    with rep-level banded pairs (a < b) — connected components over them
    yield the same clusters as the naive form without the c^2 pairs,
    exactly like the text twin. NULL payloads are OUT OF SCOPE and
    dropped explicitly (the `ahash_near_dup_pairs` convention — a NULL
    can neither hash nor band; callers deduplicating a corpus with
    missing payloads should know those assets are absent, not merely
    unpaired)."""
    from dumpr_spark.functions.dedup import (
        exact_prepass_edges, simhash_band_candidates_scaled,
    )

    imgs = assets.where(
        (F.col("media_type") == "image") & F.col("payload").isNotNull()
    )
    # the SAME prepass as the text twin (content_hash groupBy -> min-id
    # rep election -> member->rep edges): md5 hashes binary payloads the
    # same way it hashes text, so the two scaled paths share one
    # implementation and cannot drift
    raw_edges, rep_ids = exact_prepass_edges(imgs, id_col=id_col,
                                             text_col="payload")
    edges = raw_edges.withColumn("hamming", F.lit(0).cast("int"))
    rep_assets = imgs.join(rep_ids, id_col, "left_semi")
    fps = ahash_images(rep_assets)
    sigs = fps.where(F.col("ahash").isNotNull()).select(
        F.col(id_col), ahash_sig64(F.col("ahash")).alias("sh64")
    )
    pairs = simhash_band_candidates_scaled(
        sigs, id_col=id_col, sig_col="sh64",
        max_hamming=max_hamming, max_bucket_size=max_bucket_size,
    )
    return edges.unionByName(pairs)
