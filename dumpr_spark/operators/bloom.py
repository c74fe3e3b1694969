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
m/64 longs on the driver — metadata-sized by design (m <= 2^27 = 16 MiB
enforced at build). Two probe tiers share the artifact: up to 2^20 bits
the words ride in the plan as one constant (bloom_semi_join, pure
codegen); above that they ship as a broadcast variable probed by an
Arrow-batched numpy map (bloom_semi_join_arrow). Measured A/B and the
three per-row-evaluation landmines: SCALE.md round-6.
"""

from __future__ import annotations

import hashlib
import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from dumpr_spark.functions.dedup import minhash_base_hash

_LOG = logging.getLogger(__name__)

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
    """Array of the k deterministic bit positions for a key: split the
    repo's 56-bit md5 base hash (functions/dedup.minhash_base_hash — ONE
    idiom, shared with the SQL oracles) into two 28-bit halves and use
    the Kirsch-Mitzenmacher double-hash g_i = h1 + i*h2 (mod m) — one
    digest per key, k positions, the standard fpp-preserving
    construction.

    The digest is let-bound ONCE (functions/expr.let — Catalyst has no
    let-expression, and neither projection collapse nor filter pushdown
    protects an expensive helper column from being re-inlined into every
    consumer: the k independent position trees each re-derived the md5
    ~3x, measured 15 digests/row and a 24 s probe at sf0.1 where one
    digest/row takes 0.6 s). Everything inside the lambda is cheap
    integer arithmetic on the bound value."""
    from dumpr_spark.functions.expr import let

    def from_h(hv):
        # integer bit ops only: h has 56 bits and a double division would
        # round above 2^53; h - h1 is a multiple of 2^28 with <= 28
        # significant bits, so the double division below is exact
        h1 = hv % F.lit(1 << 28)
        h2 = ((hv.cast("long") - h1) / F.lit(1 << 28)).cast("long") * 2 + 1
        return F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: ((h1 + i * h2) % F.lit(m_bits)).cast("long"),
        )

    return let(minhash_base_hash(col.cast("string")), from_h)


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
    import numpy as np

    pairs = keys.where(F.col(key_col).isNotNull()).select(
        F.explode(_positions(F.col(key_col), k, m_bits)).alias("p")
    )
    # the Python API's shiftleft only takes literal shift amounts; the SQL
    # form accepts a column, so the mask is built with expr()
    #
    # Collected via Arrow (toPandas), not Row objects: at the 2^27 cap the
    # set-word frame is up to 2^21 rows, which is 16 MiB of longs over
    # Arrow but ~100x that in driver-side Row overhead through the py4j
    # collect path (r7 review item). The scatter into the dense word
    # array is one vectorized numpy assignment — `w` is the groupBy key,
    # so indices are distinct by construction.
    wpdf = (
        pairs.select(
            F.expr("p DIV 64 AS w"),
            F.expr("shiftleft(CAST(1 AS LONG), CAST(p % 64 AS INT)) AS mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .toPandas()
    )
    arr = np.zeros(m_bits // 64, dtype=np.int64)
    arr[wpdf["w"].to_numpy(dtype=np.int64)] = wpdf["bits"].to_numpy(dtype=np.int64)
    return BloomFilter(words=arr.tolist(), k=k)


def bloom_semi_join(left: DataFrame, bloom: BloomFilter, key_col: str) -> DataFrame:
    """Keep left rows whose key MIGHT be in the set the bloom was built
    from: no false negatives, false positives at the filter's fpp. A
    narrow map over the left scan — zero shuffle, predicate-pushdown
    friendly (the filter composes with partition pruning upstream).

    The whole probe is ONE filter expression: the words ship as a single
    ArrayType Literal (built once and shared — `F.array(*lits)` would
    re-construct the m/64-element array per row, measured 40x slower),
    the digest is computed once per row (`_positions`' let-binding), and
    each position's bit is tested with `element_at` + `bit_get` inside
    `forall`. No helper columns, nothing for filter pushdown to
    duplicate, and the expression stays inside whole-stage codegen.
    """
    k, m_bits = bloom.k, bloom.m_bits
    if m_bits > _LITERAL_PROBE_CAP:
        raise ValueError(
            f"bloom_semi_join inlines the filter as a plan literal and is "
            f"capped at m_bits=2^20; this filter has {m_bits} bits — "
            f"probe it with bloom_semi_join_arrow instead"
        )
    # words travel driver->JVM as ONE string literal: F.lit(list) costs
    # ~0.4 ms/element in py4j element-wise conversion (6+ s at m=2^20,
    # measured), and F.array(*lits) additionally re-CONSTRUCTS the array
    # per row. split+cast of a single literal is constant-folded by
    # Catalyst into one shared ArrayType constant at plan compile.
    packed = ",".join(str(int(w)) for w in bloom.words)
    lit_words = F.split(F.lit(packed), ",").cast("array<long>")
    cond = F.forall(
        _positions(F.col(key_col), k, m_bits),
        lambda p: F.bit_get(
            F.element_at(lit_words, F.shiftright(p, 6).cast("int") + 1),
            (p % 64).cast("int"),
        )
        == 1,
    )
    return left.where(F.col(key_col).isNotNull() & cond)


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


class RefreshingBloom:
    """Rebuild-and-swap lifecycle for the reusable artifact: the bloom is
    built once per DIM VERSION, not per query and not per micro-batch.

    "Build once, filter many" (module docstring) needs an invalidation
    story when the dim it summarizes refreshes mid-stream — same
    discipline as the schema catalog's DDL invalidation (R9; the
    reference invalidates its table-map caches on schema events,
    `stream.clj:204-212`). Callers give a cheap driver-side `version_fn`
    (a catalog snapshot id, a `_dim_version` marker, max(updated_at)) and
    a `build_fn` (build_bloom over the current dim); `current()` rebuilds
    only when the version changes.

    In a stream, call `current()` at the top of each foreachBatch body:
    a dim refresh lands at the next micro-batch boundary — stale by at
    most one batch, never a torn read, because the swap is a driver-side
    rebind of an IMMUTABLE artifact (BloomFilter is frozen; in-flight
    plans keep probing the words they captured). Probe cost is unchanged:
    the rebuild is one pass over the dim, amortized across every batch of
    the version's lifetime.

    Torn-read guard (r7 review): a refresh landing BETWEEN the version
    read and the build would stamp a bloom built from newer — or
    mid-overwrite — dim data with the older token, and a non-atomic
    refresher could then serve one batch through a filter built from a
    partially-written dim. `current()` therefore re-reads `version_fn`
    AFTER the build and rebuilds while the token moved (bounded retries;
    on exhaustion it stamps a sentinel so the NEXT call rebuilds rather
    than trusting a possibly-torn artifact). The guard makes version
    churn safe; actual dim-DATA atomicity is still the publisher's
    contract — publish the data, THEN bump the version (the usual
    snapshot/manifest discipline), never the reverse."""

    # version flips observed mid-build before current() gives up for this
    # call and marks the artifact for rebuild on the next one — churn this
    # sustained means the caller's refresh cadence outpaces the build
    _MAX_REBUILDS_PER_CALL = 3

    def __init__(self, build_fn, version_fn):
        self._build, self._version = build_fn, version_fn
        self._seen: object = None
        self._fresh = False  # distinguishes "never built" from version None
        self.builds = 0  # diagnostic: rebuild count for tests/monitoring
        self.bloom: BloomFilter | None = None

    def current(self) -> BloomFilter:
        v = self._version()
        for _ in range(self._MAX_REBUILDS_PER_CALL):
            if self._fresh and v == self._seen:
                return self.bloom
            # invalidate BEFORE building: an A->B->A version flip around a
            # mid-churn build must not let the NEXT loop iteration certify
            # the torn artifact against the stale (_fresh, _seen=A) pair
            # from a previous call (review-caught ABA hole)
            self._fresh = False
            self.bloom = self._build()
            self.builds += 1
            # re-read AFTER the build: if a refresh landed mid-build the
            # artifact may mix old and new dim data — loop and rebuild
            # against the settled version
            v2 = self._version()
            if v2 == v:
                self._seen, self._fresh = v, True
                return self.bloom
            v = v2
        # version still moving after the retry budget: serve the freshest
        # build (no false negatives vs ITS snapshot) but leave the artifact
        # marked stale so the next call rebuilds once the churn settles —
        # and SAY so (r8 advice): callers that need snapshot consistency
        # for this batch can check .stale and skip the prefilter (probe
        # nothing, keep every row — the bloom is only ever an optimization)
        self._fresh = False
        _LOG.warning(
            "RefreshingBloom: version still moving after %d rebuilds; "
            "serving a bloom that may be torn relative to the settled dim "
            "(check .stale; next call rebuilds)",
            self._MAX_REBUILDS_PER_CALL,
        )
        return self.bloom

    @property
    def stale(self) -> bool:
        """True when the bloom served by the LAST `current()` call could
        not be certified against a settled dim version (the retry budget
        exhausted under sustained churn) — or when nothing was ever
        certified. A caller needing snapshot consistency for the current
        batch should treat a stale bloom as 'no prefilter' (a bloom is
        an optimization: skipping it keeps every row, never drops one);
        the next `current()` call rebuilds once the churn settles."""
        return not self._fresh
