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

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from dumpr_spark.functions.dedup import minhash_base_hash


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
    partition; the driver receives m/64 longs total. The probe inlines
    the words as a literal array, so m is capped at 2^20 (16k longs) to
    keep the expression tree codegen-friendly — a bigger filter wants a
    real broadcast variable + Arrow UDF probe, a different operator.
    """
    if m_bits <= 0 or m_bits % 64 or m_bits > 1 << 20:
        raise ValueError("m_bits must be a positive multiple of 64, at most 2^20")
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
