"""Bloom-filter semi-join: filter a huge left side by the keys of a much
smaller right side WITHOUT shuffling the left.

The 100 TB shape: a shuffle semi-join moves every left row to its key's
reducer; a broadcast semi-join needs the right side's full key set on every
executor. The bloom pre-filter needs only m/8 bytes (fpp-controlled) on
each executor, turns the probe into a narrow map over the left scan, and
never drops a matching row (no false negatives — false positives pass and
are eliminated by whatever exact join follows, or tolerated by consumers
that accept fpp slack). Spark's runtime row-level bloom
(spark.sql.optimizer.runtime.bloomFilter.enabled) does this inside one
query when statistics allow; this operator makes the plan explicit,
reusable across queries (build once, filter many), and deterministic.

Determinism: positions come from the md5-based 56-bit family used across
the repo (functions/dedup idiom) — the same build on any engine sets the
same bits, so an oracle can replay membership exactly.

Build cost: one pass over the right keys, k positions each, folded to
m/64 longs with bit_or partial aggregation (map-side combining; the
shuffle carries at most words_per_partition rows). The finished filter is
m/64 longs on the driver — metadata-sized by design (m <= 2^22 enforced)
— then broadcast back as a literal array.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from dumpr_spark.functions.dedup import minhash_base_hash

# The literal-array probe inlines m/64 longs into every task's plan; past
# ~16k longs the expression tree bloats codegen, so bigger filters must use
# the broadcast + Arrow probe (bloom_semi_join_arrow) instead.
_LITERAL_PROBE_CAP = 1 << 20
# Build-side ceiling: 2^27 bits = 16 MiB of words — a comfortable broadcast
# variable, far past any useful local filter, and a guard against typo-sized
# m_bits allocating gigabytes on the driver.
_BUILD_CAP = 1 << 27


@dataclass(frozen=True)
class BloomFilter:
    """The broadcastable artifact: m/64 longs PLUS the k it was built
    with — carrying k in the artifact makes a build/probe k mismatch
    (which would silently drop matching rows) impossible."""

    words: list = field(default_factory=list)
    k: int = 5

    @property
    def m_bits(self) -> int:
        return len(self.words) * 64


def _positions(col, k: int, m_bits: int):
    """k deterministic bit positions for a key: split the repo's 56-bit
    md5 base hash (functions/dedup.minhash_base_hash — ONE idiom, shared
    with the SQL oracles) into two 28-bit halves and use the
    Kirsch-Mitzenmacher double-hash g_i = h1 + i*h2 (mod m) — one digest
    per key, k positions, the standard fpp-preserving construction."""
    h = minhash_base_hash(col.cast("string"))
    # integer bit ops only: h has 56 bits and a double division would
    # round above 2^53; h - h1 is a multiple of 2^28 with <= 28
    # significant bits, so the double division below is exact
    h1 = h % F.lit(1 << 28)
    h2 = (h.cast("long") - h1) / F.lit(1 << 28)
    h2 = h2.cast("long") * 2 + 1  # odd -> full-period stride
    return [((h1 + F.lit(i) * h2) % F.lit(m_bits)).cast("long") for i in range(k)]


def build_bloom(keys: DataFrame, key_col: str, m_bits: int = 1 << 16,
                k: int = 5) -> BloomFilter:
    """Fold the distinct keys of `keys[key_col]` into a BloomFilter
    artifact (m_bits/64 longs + k).

    Scale shape: explode each key to its k (word, mask) pairs, bit_or per
    word with map-side combine — the shuffle carries <= m/64 rows per map
    partition; the driver receives m/64 longs total. Filters up to 2^20
    bits probe via the codegen-friendly literal array (bloom_semi_join);
    bigger ones (up to 2^27 = 16 MiB of words) must probe via the
    broadcast + Arrow path (bloom_semi_join_arrow).
    """
    if m_bits <= 0 or m_bits % 64 or m_bits > _BUILD_CAP:
        raise ValueError("m_bits must be a positive multiple of 64, at most 2^27")
    if k < 1 or k > 16:
        raise ValueError("k must be in 1..16")
    pos = _positions(F.col(key_col), k, m_bits)
    pairs = keys.where(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*pos)).alias("p")
    )
    # the Python API's shiftleft only takes literal shift amounts; the SQL
    # form accepts a column, so the mask is built with expr()
    words = (
        pairs.select(
            F.expr("p DIV 64 AS w"),
            F.expr("shiftleft(CAST(1 AS LONG), CAST(p % 64 AS INT)) AS mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["w"]] = r["bits"]
    return BloomFilter(words=arr, k=k)


def bloom_semi_join(left: DataFrame, bloom: BloomFilter, key_col: str) -> DataFrame:
    """Keep left rows whose key MIGHT be in the set the bloom was built
    from: no false negatives, false positives at the filter's fpp. A
    narrow map over the left scan — zero shuffle, predicate-pushdown
    friendly (the filter composes with partition pruning upstream).

    The bit test indexes a literal array column (`element_at`), so the
    filter ships with the plan — no broadcast variable plumbing, and the
    whole expression stays inside whole-stage codegen.
    """
    k, m_bits = bloom.k, bloom.m_bits
    if m_bits > _LITERAL_PROBE_CAP:
        raise ValueError(
            f"bloom_semi_join inlines the filter as a plan literal and is "
            f"capped at m_bits=2^20; this filter has {m_bits} bits — "
            f"probe it with bloom_semi_join_arrow instead"
        )
    scaffold = ["_bloom", *[f"_p{i}" for i in range(k)]]
    clash = set(scaffold) & set(left.columns)
    if clash:
        raise ValueError(
            f"bloom_semi_join: column names {sorted(clash)} are reserved "
            f"probe scaffolding — rename them on the input first"
        )
    lit_words = F.array(*[F.lit(w).cast("long") for w in bloom.words])
    # column shift amounts need the SQL form; route each position through
    # a named helper column, test its bit, then drop the scaffolding
    probed = left.where(F.col(key_col).isNotNull()).withColumn("_bloom", lit_words)
    cond = F.lit(True)
    for i, p in enumerate(_positions(F.col(key_col), k, m_bits)):
        probed = probed.withColumn(f"_p{i}", p)
        bit = F.expr(
            f"shiftrightunsigned(element_at(_bloom, CAST(_p{i} DIV 64 AS INT) + 1),"
            f" CAST(_p{i} % 64 AS INT)) % 2"
        )
        cond = cond & (bit != 0)
    return probed.where(cond).drop(*scaffold)


def bloom_semi_join_arrow(left: DataFrame, bloom: BloomFilter,
                          key_col: str) -> DataFrame:
    """Scale-path probe: same membership semantics as bloom_semi_join, for
    filters too large to inline as a plan literal (m_bits up to 2^27 =
    16 MiB of words).

    The words ship ONCE per executor as a real Spark broadcast variable
    instead of m/64 literals in every task's serialized plan; membership
    is tested in an Arrow-batched mapInPandas. Per row the Python side
    computes the one md5 digest the JVM probe would compute (identical
    hex-prefix idiom, so both probes keep/drop exactly the same rows);
    every step after the digest — split, stride, k positions, word index,
    bit test — is vectorized numpy over the whole Arrow batch.

    Still zero shuffle: mapInPandas is a narrow map over the left scan.
    Trade-off vs the literal probe: the plan stays small and the filter is
    shared across all tasks on an executor, but rows cross the JVM->Arrow
    boundary — prefer the literal probe under its cap, this one above it.
    """
    import numpy as np

    k, m_bits = bloom.k, bloom.m_bits
    helper = "_bloom_key_str"
    if helper in left.columns:
        raise ValueError(
            f"bloom_semi_join_arrow: column name {helper!r} is reserved "
            f"probe scaffolding — rename it on the input first"
        )
    out_cols = list(left.columns)
    # cast to string JVM-side so Python sees the exact bytes Spark's
    # md5(cast(key as string)) would digest, whatever the key type
    prepared = (
        left.where(F.col(key_col).isNotNull())
        .withColumn(helper, F.col(key_col).cast("string"))
    )
    words_np = np.array(bloom.words, dtype=np.int64).view(np.uint64)
    bc = left.sparkSession.sparkContext.broadcast(words_np)

    def probe(batches):
        words = bc.value
        u64 = np.uint64
        for pdf in batches:
            keys = pdf[helper]
            h = np.fromiter(
                (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:14], 16)
                 for s in keys),
                dtype=np.uint64, count=len(keys),
            )
            # Kirsch-Mitzenmacher double hash, mirroring _positions: h is
            # 56 bits, h1 < 2^28, h2 < 2^29, i*h2 < 2^33 — no overflow
            h1 = h % u64(1 << 28)
            h2 = ((h - h1) >> u64(28)) * u64(2) + u64(1)
            keep = np.ones(len(keys), dtype=bool)
            for i in range(k):
                pos = (h1 + u64(i) * h2) % u64(m_bits)
                w = words[(pos >> u64(6)).astype(np.int64)]
                keep &= ((w >> (pos & u64(63))) & u64(1)).astype(bool)
            yield pdf.loc[keep, out_cols]

    return prepared.mapInPandas(probe, schema=left.schema)
