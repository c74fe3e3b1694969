"""Engine facade — the public API a user of the reference would reach for.

Reference public surface (/root/reference/src/dumpr/core.clj): create
table-load / binlog streams, start/stop, read positions, consume the change
source. Engine re-expresses that as: load snapshots, ingest change feeds,
materialize current state, and query it with DataFrame/SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from dumpr_spark.cdc.envelope import snapshot_to_changes, validate_envelope
from dumpr_spark.cdc.materialize import materialize, materialize_asof, scd2_history
from dumpr_spark.cdc.positions import next_position
from dumpr_spark.sources.files import TPCH_TABLES, read_table_dir


class Engine:
    """Session + catalog of registered tables + CDC entry points.

    Lifecycle maps R19 (start!/stop! protocols, stream.clj:287-346) onto
    SparkSession/StreamingQuery lifecycles.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    # -- catalog ---------------------------------------------------------
    def register(self, name: str, df: DataFrame) -> None:
        self._tables[name] = df
        df.createOrReplaceTempView(name)

    def load_dir(self, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES) -> "Engine":
        for name, df in read_table_dir(self.spark, sf_dir, tables).items():
            self.register(name, df)
        return self

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # -- CDC (reference core surface) -----------------------------------
    def snapshot_changes(self, table_ids: dict[str, str]) -> DataFrame:
        """Ordered multi-table snapshot -> envelope (R1+R12): tables loaded in
        the given dict order, order reified in seq (core.clj:85-89)."""
        parts = [
            snapshot_to_changes(self.table(t), t, id_col, table_seq=i)
            for i, (t, id_col) in enumerate(table_ids.items())
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def materialize(self, changes: DataFrame) -> DataFrame:
        return materialize(validate_envelope(changes))

    def materialize_salted(self, changes: DataFrame, salt: int = 16) -> DataFrame:
        """The hot-key form of materialize: two-phase salted fold, exact
        same result (pair it with the key_hotspots diagnostic to pick
        `salt` — SCALE.md round-6)."""
        from dumpr_spark.cdc.materialize import materialize_salted

        return materialize_salted(validate_envelope(changes), salt=salt)

    def materialize_asof(self, changes: DataFrame, seq_cutoff: int) -> DataFrame:
        """State as of a stream position (time travel over the log)."""
        return materialize_asof(validate_envelope(changes), seq_cutoff)

    def history(self, changes: DataFrame) -> DataFrame:
        """SCD2 validity-interval view of the change stream."""
        return scd2_history(validate_envelope(changes))

    def next_position(self, changes: DataFrame):
        return next_position(changes)

    # -- analytics toolkit (LLM-pipeline surface) ------------------------
    # Thin pass-throughs to functions/* so a library user discovers the
    # full toolkit from the one entry point; each target carries its own
    # scale story + tests.
    def dedup_exact(self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
        """Keep one row per distinct content hash (smallest id wins)."""
        from dumpr_spark.functions.dedup import exact_dedup

        return exact_dedup(df, id_col=id_col, text_col=text_col)

    def dedup_near_pairs(self, df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", num_hashes: int = 8,
                         band_size: int = 2, k: int = 3,
                         max_bucket_size: int | None = 1000) -> DataFrame:
        """MinHash+LSH near-duplicate candidate pairs via the duplicate-
        heavy-safe scaled variant (exact-copy pre-pass + band-bucket cap —
        the 100 TB shape; the facade must never surface the plain form
        whose bucket self-join is quadratic in the copy count)."""
        from dumpr_spark.functions.dedup import minhash_lsh_pairs_scaled

        return minhash_lsh_pairs_scaled(
            df, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
            band_size=band_size, k=k, max_bucket_size=max_bucket_size,
        )

    def image_near_dup_pairs(self, assets: DataFrame,
                             id_col: str = "asset_id",
                             max_hamming: int = 3,
                             max_bucket_size: int | None = 1000) -> DataFrame:
        """Image near-duplicate (a, b, hamming) pairs via the duplicate-
        heavy-safe scaled variant (exact-payload md5 pre-pass + aHash
        banding over representatives + band-bucket cap — the 100 TB
        shape; the facade must never surface the plain banding whose
        identical-payload buckets are quadratic in the copy count, the
        r9-measured 591x pair blowup)."""
        from dumpr_spark.functions.multimodal import ahash_near_dup_pairs_scaled

        return ahash_near_dup_pairs_scaled(
            assets, id_col=id_col, max_hamming=max_hamming,
            max_bucket_size=max_bucket_size,
        )

    def similar_topk(self, corpus: DataFrame, queries: DataFrame, k: int = 3,
                     method: str = "brute", **kw) -> DataFrame:
        """Cosine top-k: 'brute' (exact), 'lsh' (hyperplane buckets), or
        'ivf' (pass centroids=DataFrame via kw)."""
        from dumpr_spark.functions import similarity as sim

        if method == "brute":
            return sim.brute_force_topk(corpus, queries, k=k, **kw)
        if method == "lsh":
            return sim.lsh_topk(corpus, queries, k=k, **kw)
        if method == "ivf":
            if "centroids" not in kw:
                raise ValueError("method='ivf' requires centroids=DataFrame")
            return sim.ivf_topk(corpus, queries, kw.pop("centroids"), k=k, **kw)
        raise ValueError(f"method must be brute/lsh/ivf, got {method!r}")

    def dedup_paragraphs(self, df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", para_tokens: int = 10) -> DataFrame:
        """Passage-level exact dedup: one row per passage occurrence with a
        `keep` flag (unique corpus-wide, or the canonical first copy)."""
        from dumpr_spark.functions.dedup import paragraph_dedup

        return paragraph_dedup(df, id_col=id_col, text_col=text_col,
                               para_tokens=para_tokens)

    def dedup_simhash_pairs(self, df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", max_hamming: int = 3) -> DataFrame:
        """SimHash near-dup pairs: 64-bit signatures + banded candidate
        join (perfect recall at hamming <= 3 by pigeonhole)."""
        from dumpr_spark.functions.dedup import (
            simhash_band_candidates, simhash_signatures,
        )

        sigs = simhash_signatures(df, id_col=id_col, text_col=text_col)
        return simhash_band_candidates(sigs, id_col=id_col, max_hamming=max_hamming)

    def weighted_median(self, df: DataFrame, group_cols, value_col: str,
                        weight_col: str, tiebreak_cols=None) -> DataFrame:
        """Per-group weighted median (weight-crossing rule)."""
        from dumpr_spark.functions.stats import weighted_median

        if isinstance(group_cols, str):  # list("flag") would group by chars
            group_cols = [group_cols]
        return weighted_median(df, list(group_cols), value_col, weight_col,
                               tiebreak_cols=tiebreak_cols)

    def publish_debezium(self, changes: DataFrame, db: str) -> DataFrame:
        """Re-emit canonical envelope rows as Debezium-wire JSON `value`
        strings (the egress inverse of the Debezium ingest adapter)."""
        from dumpr_spark.sources.cdc_json import changes_to_debezium

        return changes_to_debezium(changes, db=db)

    def quantile_sketch(self, df: DataFrame, value_col: str = "value",
                        group_cols=("event_type",), qs=(0.5, 0.95),
                        bin_width: float = 5.0, n_bins: int = 100) -> DataFrame:
        """Mergeable fixed-bin quantile estimates per group."""
        from dumpr_spark.functions import sketches as sk

        bins = sk.histogram_bins(df, value_col, list(group_cols), bin_width, n_bins)
        return sk.histogram_quantiles(bins, list(qs), list(group_cols), bin_width)

    def asof(self, left: DataFrame, right: DataFrame, on: str,
             left_time: str, right_time: str, right_cols=None,
             tolerance: str | None = None) -> DataFrame:
        """As-of join (latest right row at-or-before each left row, per
        key), optional staleness bound (INTERVAL string, e.g. '1 HOUR') —
        the union-carry form, one shuffle on the key, never a range join."""
        from dumpr_spark.operators.asof import asof_join

        return asof_join(left, right, on, left_time, right_time,
                         right_cols=right_cols, tolerance=tolerance)

    def ntile(self, df: DataFrame, k: int, val_col: str, id_col: str,
              out_col: str = "ntile", descending: bool = True) -> DataFrame:
        """Global NTILE without a global-order window (the two-phase
        distributed form: quantile range-buckets + per-bucket rank +
        broadcast offsets)."""
        from dumpr_spark.operators.ntile import global_ntile

        return global_ntile(df, k, val_col, id_col, out_col=out_col,
                            descending=descending)

    def merge_intervals(self, df: DataFrame, key_cols, start_col: str,
                        end_col: str) -> DataFrame:
        """Coalesce overlapping/touching [start, end] intervals per key
        (gaps-and-islands over durations — running-max-end islands)."""
        from dumpr_spark.operators.intervals import merge_intervals

        if isinstance(key_cols, str):
            key_cols = [key_cols]
        return merge_intervals(df, list(key_cols), start_col, end_col)

    def train_ivf(self, vectors: DataFrame, k: int = 16, id_col: str = "vec_id",
                  vec_col: str = "embedding", max_iter: int = 4,
                  eps: float = 0.06) -> DataFrame:
        """Train IVF centroids with the deterministic Lloyd loop
        (engine-replayable; see functions/similarity.train_centroids_lloyd)
        — returns (cent_id, cent_vec) ready for similar_topk's IVF path."""
        from dumpr_spark.functions.similarity import train_centroids_lloyd

        cents, _counts, _n, _conv = train_centroids_lloyd(
            vectors, k=k, id_col=id_col, vec_col=vec_col,
            max_iter=max_iter, eps=eps,
        )
        return cents

    def bloom_filter(self, keys: DataFrame, key_col: str,
                     m_bits: int = 1 << 16, k: int = 5):
        """Build a deterministic BloomFilter artifact (m_bits/64 longs +
        k) from a key set — pair with bloom_semi_join to pre-filter a
        huge scan."""
        from dumpr_spark.operators.bloom import build_bloom

        return build_bloom(keys, key_col, m_bits=m_bits, k=k)

    def bloom_semi_join(self, left: DataFrame, bloom, key_col: str) -> DataFrame:
        """Zero-shuffle semi-join: keep left rows whose key might be in
        the bloom's set (no false negatives; fpp-bounded extras). The
        artifact carries its own k, so build/probe can never mismatch."""
        from dumpr_spark.operators.bloom import bloom_semi_join

        return bloom_semi_join(left, bloom, key_col)

    def top_direction(self, vectors: DataFrame, vec_col: str = "embedding",
                      iters: int = 2) -> list:
        """Rounded unit top principal direction by eps-rounded power
        iteration (engine-replayable; two 64-cell passes per step) —
        feed into remove_direction or an anisotropy diagnostic."""
        from dumpr_spark.functions.similarity import power_iteration_topdir

        return power_iteration_topdir(vectors, vec_col, iters)

    def remove_direction(self, vectors: DataFrame, direction: list,
                         vec_col: str = "embedding",
                         out_col: str = "debiased",
                         renormalize: bool = True) -> DataFrame:
        """All-but-the-top debias APPLY: subtract each vector's projection
        onto `direction` (x' = x - (x.u/u.u)u), optionally renormalize.
        One narrow map — the direction inlines as a literal."""
        from dumpr_spark.functions.similarity import remove_direction

        return remove_direction(vectors, direction, vec_col, out_col,
                                renormalize)

    def bloom_semi_join_arrow(self, left: DataFrame, bloom,
                              key_col: str) -> DataFrame:
        """Scale-path bloom probe for filters past the literal-array cap
        (m_bits up to 2^27): words ship as ONE broadcast variable per
        executor, membership tested in an Arrow-batched numpy map —
        identical keep/drop decisions to bloom_semi_join, still zero
        shuffle."""
        from dumpr_spark.operators.bloom import bloom_semi_join_arrow

        return bloom_semi_join_arrow(left, bloom, key_col)

    def asof_enrich_stream(self, left: DataFrame, right: DataFrame, on: str,
                           left_time: str, right_time: str,
                           right_cols=None, tolerance_ms=None) -> DataFrame:
        """Streaming as-of enrichment: latest right payload per key carried
        in 2 scalars of state (streaming/asof.streaming_asof_enrich)."""
        from dumpr_spark.streaming.asof import streaming_asof_enrich

        return streaming_asof_enrich(
            left, right, on, left_time, right_time,
            right_cols=right_cols, tolerance_ms=tolerance_ms,
        )


def testdata_dir(default_sf: str = "sf0.001") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", f"/root/testdata/{default_sf}")
