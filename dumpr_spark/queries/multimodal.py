"""Multimodal-column queries: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched mapInPandas (SURVEY §2.2-J).

The testdata has no binary column, so assets are derived deterministically
from `documents` IN BOTH ENGINES: payload = UTF-8 bytes of `text`,
media_type cycles image/audio/video by doc_id % 3, duration_ms = n_chars*10.
The "decode" is the documented stub (sha256-derived 8-dim feature,
functions/multimodal.py) — the Spark plumbing (BinaryType schema, Arrow
batches, explode fan-out) is real; only the codec call is fake, and because
the stub is a hash the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpr_spark.functions import multimodal as mm
from dumpr_spark.queries.base import eps_round, query, t


def _assets(spark, sf_dir):
    """documents -> canonical asset DataFrame (ASSET_SCHEMA shape)."""
    d = t(spark, sf_dir, "documents")
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), media).alias("mime"),
        F.when(media != "audio", F.lit(64)).cast("int").alias("width"),
        F.when(media != "audio", F.lit(48)).cast("int").alias("height"),
        F.when(media != "image", F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


# DuckDB: parse hex byte i (0-based) of sha256(text || media_type)
def _hexbyte(i: int) -> str:
    c1 = f"substr(h, {2 * i + 1}, 1)"
    c2 = f"substr(h, {2 * i + 2}, 1)"
    return f"((instr('0123456789abcdef', {c1})-1)*16 + (instr('0123456789abcdef', {c2})-1))"


_FEATURE_ORACLE = (
    """
    WITH assets AS (
      SELECT doc_id AS asset_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             text
      FROM documents
    ),
    hashed AS (
      SELECT asset_id, media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text || media_type) AS h
      FROM assets
    )
    SELECT asset_id, media_type, n_bytes, """
    + ", ".join(f"CAST({_hexbyte(i)} AS INT) AS f{i}" for i in range(8))
    + """
    FROM hashed ORDER BY asset_id
    """
)


@query("multimodal_features", _FEATURE_ORACLE, tags=("llm", "multimodal", "flagship"))
def multimodal_features(spark, sf_dir):
    """Decode + feature-extract over binary payloads via mapInPandas.

    Feature floats are re-quantized to the source bytes (f*255) so the check
    is exact; the array<float> itself is asserted in tests/test_llm_ops.py.
    At 100 TB: repartition so payload bytes/partition fit executor memory;
    the mapInPandas stage is a narrow map (no shuffle)."""
    feats = mm.extract_features(_assets(spark, sf_dir))
    byte_cols = [
        F.round(F.element_at("feature", i + 1).cast("double") * 255).cast("int").alias(f"f{i}")
        for i in range(8)
    ]
    return feats.select("asset_id", "media_type", "n_bytes", *byte_cols).orderBy("asset_id")


@query(
    "multimodal_frame_plan",
    """
    SELECT doc_id AS asset_id, CAST(f * 1000 AS BIGINT) AS frame_ts_ms
    FROM documents,
         LATERAL (SELECT unnest(generate_series(0, CAST(floor(n_chars * 10 / 1000.0) AS INT))) AS f) g
    WHERE doc_id % 3 = 2
    ORDER BY asset_id, frame_ts_ms
    """,
    tags=("llm", "multimodal"),
)
def multimodal_frame_plan(spark, sf_dir):
    """Video frame-sampling plan: pure relational explode (one row per frame
    to decode at 1 fps). The decode itself would consume this plan."""
    plan = mm.frame_sample_plan(_assets(spark, sf_dir), every_ms=1000)
    return plan.orderBy("asset_id", "frame_ts_ms")


@query(
    "multimodal_metadata",
    """
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(CASE WHEN doc_id % 3 <> 0 THEN n_chars * 10 END) AS BIGINT) AS max_duration_ms
    FROM documents
    GROUP BY 1 ORDER BY media_type
    """,
    tags=("llm", "multimodal"),
)
def multimodal_metadata(spark, sf_dir):
    """Typed-metadata rollup over the asset table (no decode touched —
    metadata queries must never read payload bytes; column pruning keeps the
    binary column out of the scan)."""
    a = _assets(spark, sf_dir)
    return (
        a.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max("duration_ms").alias("max_duration_ms"),
        )
        .orderBy("media_type")
    )


@query(
    "multimodal_audio_windows",
    """
    WITH audio AS (
      SELECT doc_id AS asset_id, n_chars * 10 AS duration_ms
      FROM documents WHERE doc_id % 3 = 1
    ),
    st AS (
      SELECT asset_id, duration_ms,
             unnest(generate_series(0, greatest(duration_ms - 2000 + 1000, 0), 1000)) AS win_start_ms
      FROM audio
    )
    SELECT asset_id, CAST(win_start_ms AS BIGINT) AS win_start_ms,
           CAST(least(2000, duration_ms - win_start_ms) AS BIGINT) AS win_len_ms
    FROM st WHERE win_start_ms < duration_ms
    ORDER BY asset_id, win_start_ms
    """,
    tags=("llm", "multimodal", "audio"),
)
def multimodal_audio_windows(spark, sf_dir):
    """Audio analysis-window plan: 2 s windows every 1 s per audio asset
    (tail-covering, last window partial) — the waveform analog of text
    chunking, consumed by the same Arrow decode stage. Pure relational
    explode, no payload bytes touched."""
    plan = mm.audio_window_plan(_assets(spark, sf_dir), window_ms=2000, stride_ms=1000)
    return plan.orderBy("asset_id", "win_start_ms")


@query(
    "multimodal_frame_dedup",
    """
    WITH v AS (
      SELECT doc_id AS asset_id, CAST(floor(n_chars * 10 / 1000.0) AS INT) AS maxf
      FROM documents WHERE doc_id % 3 = 2
    ),
    fr AS (
      SELECT asset_id, unnest(generate_series(0, maxf)) AS f FROM v
    ),
    h AS (
      SELECT asset_id, f,
             md5(CAST(asset_id % 7 AS VARCHAR) || '#' || CAST(f AS VARCHAR)) AS frame_hash
      FROM fr
    )
    SELECT frame_hash, CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(asset_id) AS BIGINT) AS keeper_asset
    FROM h GROUP BY frame_hash HAVING COUNT(*) > 1
    ORDER BY frame_hash
    """,
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_frame_dedup(spark, sf_dir):
    """Cross-video duplicate-frame detection: sample frames (the real
    `frame_sample_plan` fan-out), fingerprint each frame, and group identical
    fingerprints — the intro/outro/logo-frame dedup step of a video-training
    pipeline. Frame content is container-stubbed deterministically (hash of
    asset_id % 7 and frame index, so every 7th video shares a frame stream —
    a real pipeline would md5/pHash decoded RGB via extract_features).

    Scale shape is exactly dedup_exact_hash's: the explode is narrow (no
    shuffle), only 16-byte fingerprints shuffle for the groupBy (never frame
    bytes), and the HAVING prunes singletons map-side-combined."""
    plan = mm.frame_sample_plan(_assets(spark, sf_dir), every_ms=1000)
    frame_hash = F.md5(
        F.concat(
            (F.col("asset_id") % 7).cast("string"),
            F.lit("#"),
            (F.col("frame_ts_ms") / 1000).cast("long").cast("string"),
        )
    )
    return (
        plan.select("asset_id", frame_hash.alias("frame_hash"))
        .groupBy("frame_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("asset_id").alias("keeper_asset"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("frame_hash")
    )


@query(
    "multimodal_format_sniff",
    """
    WITH assets AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB
               WHEN 1 THEN '\\x89\\x50\\x4E\\x47'::BLOB
               WHEN 2 THEN 'RIFF'::BLOB
               ELSE ''::BLOB
             END || encode(text) AS payload  -- encode(): escape-free UTF-8; CAST errors on non-ASCII
      FROM documents
    ),
    sniffed AS (
      -- DuckDB has no substring(BLOB,...): prefix-match on the hex dump
      -- instead (oracle-side only; Spark slices the binary directly)
      SELECT doc_id, octet_length(payload) AS n_bytes,
             CASE
               WHEN substr(hex(payload), 1, 6) = 'FFD8FF' THEN 'jpeg'
               WHEN substr(hex(payload), 1, 8) = '89504E47' THEN 'png'
               WHEN substr(hex(payload), 1, 8) = '52494646' THEN 'riff'
               ELSE 'unknown'
             END AS sniffed
      FROM assets
    )
    SELECT sniffed, CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM sniffed GROUP BY sniffed ORDER BY sniffed
    """,
    tags=("llm", "multimodal"),
)
def multimodal_format_sniff(spark, sf_dir):
    """Container-format sniffing over opaque binary payloads: classify each
    asset by its magic bytes (JPEG FFD8FF / PNG 89504E47 / RIFF) — the
    first gate of any multimodal ingest (route by ACTUAL content, never by
    extension/mime metadata, which lies at corpus scale). Payloads are the
    deterministic fake-asset convention (headers injected by doc_id % 4,
    body = UTF-8 text bytes) so both engines derive identical binaries;
    the sniff itself — binary substring + hex compare — is exactly the
    production expression.

    Scale shape: narrow projection reading only the payload PREFIX
    expression + one grouped rollup to <= 4 format rows; with parquet
    binary columns the substring still scans full payload pages (parquet
    has no sub-value pruning) — the production layout materializes a
    4-byte `magic` column at ingest so the big BLOB column stays pruned
    out of this scan entirely."""
    d = t(spark, sf_dir, "documents")
    header = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(bytes([0xFF, 0xD8, 0xFF, 0xE0])))
        .when(F.col("doc_id") % 4 == 1, F.lit(bytes([0x89, 0x50, 0x4E, 0x47])))
        .when(F.col("doc_id") % 4 == 2, F.lit(b"RIFF"))
        .otherwise(F.lit(b""))
    )
    assets = d.select(
        "doc_id",
        F.concat(header, F.encode(F.col("text"), "UTF-8")).alias("payload"),
    )
    sniffed = assets.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.when(F.hex(F.substring("payload", 1, 3)) == "FFD8FF", "jpeg")
        .when(F.hex(F.substring("payload", 1, 4)) == "89504E47", "png")
        .when(F.hex(F.substring("payload", 1, 4)) == "52494646", "riff")
        .otherwise("unknown")
        .alias("sniffed"),
    )
    return (
        sniffed.groupBy("sniffed")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assets"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .orderBy("sniffed")
    )


@query(
    "multimodal_resolution_buckets",
    """
    WITH assets AS (
      SELECT doc_id AS asset_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             16 * (1 + doc_id % 5) AS width,
             9 * (1 + doc_id % 7) AS height,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT media_type, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           ROUND(width / CAST(height AS DOUBLE) + 1e-9, 3) AS aspect,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
    FROM assets WHERE media_type <> 'audio'
    GROUP BY media_type, width, height
    ORDER BY media_type, width, height
    """,
    tags=("multimodal", "profile"),
)
def multimodal_resolution_buckets(spark, sf_dir):
    """Resolution inventory over the visual corpus: assets grouped into
    (width, height) cells with aspect ratio, count, and payload-byte
    totals — the profiling pass that sizes a resize/transcode plan (which
    target resolutions cover the corpus, how many bytes each bucket
    moves). Resolutions derive deterministically from doc_id (the testdata
    carries no real dimensions) so both engines bucket identically; audio
    is excluded (no spatial dims).

    Scale shape: the binary payload contributes only octet_length —
    column-pruned to a length read, the BLOB itself never shuffles; the
    scan collapses to |distinct resolutions| x |media| cells map-side."""
    d = t(spark, sf_dir, "documents")
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    assets = d.select(
        media.alias("media_type"),
        (F.lit(16) * (F.lit(1) + F.col("doc_id") % 5)).cast("int").alias("width"),
        (F.lit(9) * (F.lit(1) + F.col("doc_id") % 7)).cast("int").alias("height"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
    ).where(F.col("media_type") != "audio")
    return (
        assets.groupBy("media_type", "width", "height")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assets"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.max("n_bytes").cast("long").alias("max_bytes"),
        )
        .select(
            "media_type", "width", "height",
            eps_round(F.col("width") / F.col("height").cast("double"), 3).alias("aspect"),
            "n_assets", "total_bytes", "max_bytes",
        )
        .orderBy("media_type", "width", "height")
    )


@query(
    "multimodal_payload_dedup",
    """
    WITH assets AS (
      SELECT doc_id AS asset_id, text,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type
      FROM documents
      UNION ALL
      SELECT doc_id + 100000, text,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END
      FROM documents WHERE doc_id % 10 = 0
    ),
    g AS (
      SELECT md5(text) AS payload_md5, MIN(asset_id) AS keep_id,
             COUNT(*) AS n_copies,
             COUNT(DISTINCT media_type) AS n_media,
             MIN(octet_length(encode(text))) AS payload_bytes
      FROM assets GROUP BY md5(text) HAVING COUNT(*) >= 2
    )
    SELECT keep_id, payload_md5, CAST(n_copies AS BIGINT) AS n_copies,
           CAST(n_media AS INT) AS n_media,
           CAST(payload_bytes AS BIGINT) AS payload_bytes,
           CAST((n_copies - 1) * payload_bytes AS BIGINT) AS wasted_bytes
    FROM g ORDER BY keep_id
    """,
    tags=("multimodal", "dedup"),
)
def multimodal_payload_dedup(spark, sf_dir):
    """Exact BINARY-payload dedup across the asset corpus (re-uploaded
    images, mirrored videos, re-encoded copies of the same bytes): group
    by md5 of the payload, keep the min-id asset, report copies, distinct
    media labels claiming those bytes (a mislabel signal when > 1), and
    the bytes a dedup pass would reclaim. Exact duplicates are injected
    (every 10th asset re-keyed +100000 — the dedup-corpus convention) so
    the operator's positive path is exercised at every scale.

    Scale shape: dedup_exact_hash's, applied to BLOBs — the 16-byte md5
    is computed map-side next to the scan, so the shuffle carries hashes
    and counters, NEVER payload bytes (the column prunes out after the
    hash); HAVING prunes singleton groups map-side. At 100 TB this is
    the first pass of the multimodal pipeline: it runs at wire speed on
    the hash alone, no decode."""
    assets = _assets(spark, sf_dir).select("asset_id", "media_type", "payload")
    copies = (
        assets.where(F.col("asset_id") % 10 == 0)
        .withColumn("asset_id", F.col("asset_id") + 100000)
    )
    corpus = assets.unionByName(copies)
    return (
        corpus.groupBy(F.md5(F.col("payload")).alias("payload_md5"))
        .agg(
            F.min("asset_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("media_type").cast("int").alias("n_media"),
            F.min(F.octet_length(F.col("payload"))).cast("long")
                .alias("payload_bytes"),
        )
        .where(F.col("n_copies") >= 2)
        .select(
            "keep_id", "payload_md5", "n_copies", "n_media", "payload_bytes",
            ((F.col("n_copies") - 1) * F.col("payload_bytes"))
                .alias("wasted_bytes"),
        )
        .orderBy("keep_id")
    )


@query(
    "multimodal_image_ahash",
    """
    WITH imgs AS (
      SELECT doc_id AS asset_id, sha256(text || 'luma') AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    px AS (
      SELECT asset_id, i,
             instr('0123456789abcdef', substr(h, i, 1)) - 1 AS d
      FROM imgs, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) g
    ),
    tot AS (SELECT asset_id, SUM(d) AS s FROM px GROUP BY asset_id),
    bits AS (
      SELECT p.asset_id, p.i,
             CASE WHEN 64 * p.d >= t.s THEN 1 ELSE 0 END AS b
      FROM px p JOIN tot t ON p.asset_id = t.asset_id
    ),
    nib AS (
      SELECT asset_id, (i - 1) // 4 AS j,
             SUM(b * CASE (i - 1) % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                      WHEN 2 THEN 2 ELSE 1 END) AS nibble
      FROM bits GROUP BY asset_id, j
    ),
    packed AS (
      SELECT asset_id,
             string_agg(substr('0123456789abcdef', CAST(nibble AS INT) + 1, 1),
                        '' ORDER BY j) AS ahash
      FROM nib GROUP BY asset_id
    ),
    stats AS (
      SELECT b.asset_id, CAST(SUM(b.b) AS INT) AS bits_set
      FROM bits b GROUP BY b.asset_id
    )
    SELECT p.asset_id, p.ahash, st.bits_set,
           ROUND(t.s / 960.0 + 1e-9, 4) AS mean_luma
    FROM packed p
    JOIN stats st ON p.asset_id = st.asset_id
    JOIN tot t ON p.asset_id = t.asset_id
    ORDER BY p.asset_id
    """,
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_image_ahash(spark, sf_dir):
    """Perceptual image fingerprints — average hash (aHash) per image
    asset: 64-bit hash packed as 16 hex chars, set-bit count, and mean
    luma. The image-side analog of text fingerprinting: hamming-close
    hashes are visually-close images, so near-dup image search bands
    these 64 bits exactly like dedup_simhash (pigeonhole recall), and
    the two scalar columns are free quality screens (all-dark /
    all-flat grids).

    The decode is the documented container stub (sha256-derived 8x8
    luma grid — Pillow absent here; `functions/multimodal.ahash_images`
    switches to the real grayscale-resize path per row when Pillow can
    decode the bytes, same schema and packing). The average-hash math
    itself is real and engine-exact: the bit threshold is the integer
    compare 64*pixel >= sum — the float mean is never formed, so no
    rounding boundary exists for engines to disagree on.

    Scale shape: one narrow Arrow-batched map over the image scan;
    payload bytes never shuffle (16 hex chars + 2 scalars per image out);
    the lateral 64-pixel expansion in the ORACLE is the replay of work
    the Spark side does inside the Python batch."""
    assets = _assets(spark, sf_dir)
    return mm.ahash_images(assets).orderBy("asset_id")


@query(
    "multimodal_ahash_neardup",
    """
    WITH imgs AS (
      SELECT doc_id AS asset_id, sha256(text || 'luma') AS h
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 100000, sha256(text || 'luma')
      FROM documents WHERE doc_id % 30 = 0
    ),
    px AS (
      SELECT asset_id, i,
             instr('0123456789abcdef', substr(h, i, 1)) - 1 AS d
      FROM imgs, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) g
    ),
    tot AS (SELECT asset_id, SUM(d) AS s FROM px GROUP BY asset_id),
    bits AS (
      SELECT p.asset_id, p.i,
             CASE WHEN 64 * p.d >= t.s THEN 1 ELSE 0 END AS b
      FROM px p JOIN tot t ON p.asset_id = t.asset_id
    ),
    sigv AS (
      SELECT asset_id,
             SUM(CAST(b AS HUGEINT) * CAST(power(2, 64 - i) AS HUGEINT)) AS v
      FROM bits GROUP BY asset_id
    ),
    sig AS (
      SELECT asset_id,
             CAST(CASE WHEN v >= CAST('9223372036854775808' AS HUGEINT)
                  THEN v - CAST('18446744073709551616' AS HUGEINT)
                  ELSE v END AS BIGINT) AS sh64
      FROM sigv
    ),
    bands AS (
      SELECT asset_id, sh64, j AS band,
             (sh64 >> (48 - 16 * j)) & 65535 AS val
      FROM sig, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) b
    ),
    cand AS (
      SELECT DISTINCT a.asset_id AS a, b.asset_id AS b, a.sh64 AS ha, b.sh64 AS hb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.val = b.val AND a.asset_id < b.asset_id
    )
    SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 3
    ORDER BY a, b
    """,
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_ahash_neardup(spark, sf_dir):
    """Near-duplicate IMAGE pair search over aHash fingerprints — the
    registered form of `functions/multimodal.ahash_near_dup_pairs` (r8
    built the fingerprints and the streaming twin; r9 registers the
    batch search itself): every image asset plus exact re-uploads
    (asset_id % 10 == 0 re-keyed +100000, the multimodal_payload_dedup
    corpus recipe) is hashed, the 16-hex aHash is re-read as a signed
    64-bit signature (two conv halves — the single-parse sign-bit NULL
    is test-pinned), and the SAME 4 x 16-bit banding as text SimHash
    yields every pair within hamming <= 3 with pigeonhole-exact recall.

    With the container's sha256-grid stub only EXACT payload copies land
    hamming-close (a hash scrambles visual similarity), so the expected
    pairs here are the re-uploads at hamming 0 plus any documents
    sharing identical text; with real Pillow decode the same machinery
    surfaces visually-close pairs at <= 3 unchanged. NULL-payload assets
    are explicitly out of scope (filtered with a docstring'd where — the
    r8 advice item).

    PEDAGOGICAL TWIN, NOT FOR VOLUME (COVERAGE.md weak-twin policy, r15
    verdict item 6): this plain form keeps the textbook shape — its
    banded bucket self-join emits c^2 pairs per c-copy image, the same
    measured duplicate-quadratic as plain dedup_minhash_lsh. At volume
    use `multimodal_ahash_neardup_scaled` (exact-copy prepass + capped
    buckets — the `Engine.image_near_dup_pairs` facade default, linear
    measured pair volume).

    Scale shape: fingerprints (16 hex chars per image) shuffle once on
    (band, value); payloads never leave the fingerprint map; the
    verify is bit_count(xor) per candidate."""
    assets = _assets(spark, sf_dir)
    copies = (
        assets.where(F.col("asset_id") % 10 == 0)
        .withColumn("asset_id", F.col("asset_id") + 100000)
    )
    fps = mm.ahash_images(assets.unionByName(copies))
    return mm.ahash_near_dup_pairs(fps, max_hamming=3).orderBy("a", "b")


@query(
    "multimodal_ahash_neardup_scaled",
    """
    WITH imgs AS (
      SELECT doc_id AS asset_id, text
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 100000, text
      FROM documents WHERE doc_id % 30 = 0
    ),
    hmap AS (SELECT asset_id, md5(text) AS ph FROM imgs),
    reps AS (SELECT ph, MIN(asset_id) AS rep FROM hmap GROUP BY ph),
    exact_edges AS (
      SELECT m.asset_id AS a, r.rep AS b, 0 AS hamming
      FROM hmap m JOIN reps r ON m.ph = r.ph
      WHERE m.asset_id <> r.rep
    ),
    rimgs AS (
      SELECT i.asset_id, sha256(i.text || 'luma') AS h
      FROM imgs i JOIN reps r ON i.asset_id = r.rep
    ),
    px AS (
      SELECT asset_id, i,
             instr('0123456789abcdef', substr(h, i, 1)) - 1 AS d
      FROM rimgs, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) g
    ),
    tot AS (SELECT asset_id, SUM(d) AS s FROM px GROUP BY asset_id),
    bits AS (
      SELECT p.asset_id, p.i,
             CASE WHEN 64 * p.d >= t.s THEN 1 ELSE 0 END AS b
      FROM px p JOIN tot t ON p.asset_id = t.asset_id
    ),
    sigv AS (
      SELECT asset_id,
             SUM(CAST(b AS HUGEINT) * CAST(power(2, 64 - i) AS HUGEINT)) AS v
      FROM bits GROUP BY asset_id
    ),
    sig AS (
      SELECT asset_id,
             CAST(CASE WHEN v >= CAST('9223372036854775808' AS HUGEINT)
                  THEN v - CAST('18446744073709551616' AS HUGEINT)
                  ELSE v END AS BIGINT) AS sh64
      FROM sigv
    ),
    bands AS (
      SELECT asset_id, sh64, j AS band,
             (sh64 >> (48 - 16 * j)) & 65535 AS val
      FROM sig, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) b
    ),
    cand AS (
      SELECT DISTINCT a.asset_id AS a, b.asset_id AS b, a.sh64 AS ha, b.sh64 AS hb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.val = b.val AND a.asset_id < b.asset_id
    ),
    banded AS (
      SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
      FROM cand WHERE bit_count(xor(ha, hb)) <= 3
    )
    SELECT a, b, CAST(hamming AS INT) AS hamming FROM (
      SELECT a, b, hamming FROM exact_edges
      UNION ALL
      SELECT a, b, hamming FROM banded
    ) ORDER BY a, b
    """,
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_ahash_neardup_scaled(spark, sf_dir):
    """Duplicate-heavy-safe image near-dup search — the registered form
    of `functions/multimodal.ahash_near_dup_pairs_scaled` and the
    at-volume DEFAULT for image near-dup (Engine.image_near_dup_pairs):
    the r9 sf1-local falsifiability run MEASURED the plain banding's
    failure mode (pair volume 168 -> 99,330, 591x at 10x docs, C(c,2)
    per identical-payload group), and this twin removes it exactly the
    way `dedup_lsh_scaled` fixed plain MinHash-LSH in r8 — an
    exact-payload md5 prepass collapses every copy group to its min-id
    representative BEFORE banding, copies leave as (copy -> rep,
    hamming=0) edges, and the rep-level banding runs capped
    (`dedup.simhash_band_candidates_scaled`, max_bucket_size=1000).

    Same corpus recipe as the plain `multimodal_ahash_neardup` (image
    assets + exact re-uploads), so the two registered forms are directly
    comparable: identical duplicate CLUSTERS via connected components
    (test-pinned), with output LINEAR in corpus size — exactly c-1
    copy->rep edges per c-copy group plus rep-level band hits — instead
    of quadratic in copy multiplicity. Re-measured at sf1-local
    (SCALE.md round-10): 16,674 pairs (= one edge per collapsed copy +
    7 band hits over 18,334 image assets) vs the plain form's 99,330;
    at the next 10x of copy multiplicity the plain form grows another
    ~100x, this one ~10x. The oracle
    replays prepass, rep-level hashing, banding, and the union; the cap
    is not modeled because no post-prepass bucket can approach 1000 at
    gate scale (the dedup_lsh_scaled convention — the cap is the
    at-volume insurance, inert on the checked path).

    Scale shape: one md5 groupBy (16-byte keys, payloads never shuffle),
    fingerprints over distinct payloads only, one (band, value) shuffle
    of 16-hex signatures, COUNT-prefiltered buckets, per-candidate
    bit_count verify."""
    assets = _assets(spark, sf_dir)
    copies = (
        assets.where(F.col("asset_id") % 10 == 0)
        .withColumn("asset_id", F.col("asset_id") + 100000)
    )
    corpus = assets.unionByName(copies)
    return (
        mm.ahash_near_dup_pairs_scaled(corpus, max_hamming=3,
                                       max_bucket_size=1000)
        .select("a", "b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("a", "b")
    )
