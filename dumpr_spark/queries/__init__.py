"""Declared query inventory — the t2 correctness contract (SURVEY §2.2).

Every operator the engine claims is registered here as a (Spark builder,
DuckDB oracle SQL) pair; the driver runs both at sf0.01 and compares
row-count + schema + order-insensitive value hash. Registration happens on
import of the submodules below.
"""

from dumpr_spark.queries.base import REGISTRY, oracle_sql, queries

# Importing registers queries. Order matters: the driver walks the registry
# in insertion order and may stop at a budget, so families it has NOT yet
# verified in a previous round go first (round 1 covered the first 50 —
# relational/windows/most scalars — leaving cdc/llm/streaming/udf unchecked).
from dumpr_spark.queries import cdc  # noqa: E402,F401
from dumpr_spark.queries import llm  # noqa: E402,F401
from dumpr_spark.queries import training  # noqa: E402,F401
from dumpr_spark.queries import multimodal  # noqa: E402,F401
from dumpr_spark.queries import streaming_batch  # noqa: E402,F401
from dumpr_spark.queries import udfs  # noqa: E402,F401
from dumpr_spark.queries import scalars  # noqa: E402,F401
from dumpr_spark.queries import windows  # noqa: E402,F401
from dumpr_spark.queries import relational  # noqa: E402,F401

# Exact ordering refinement: names the driver fully verified in round 1
# (CORRECTNESS_r01.json, hash_match or declared rows-only) move to the END of
# the registry so a budget-capped walk spends its budget on the not-yet-
# verified entries (module ordering above gets this mostly right; this makes
# it exact for the mixed modules).
_R1_VERIFIED = {
    "agg_approx_distinct", "agg_bool", "agg_collect_sorted", "agg_count_distinct",
    "agg_cube", "agg_global", "agg_grouping_sets", "agg_having", "agg_max_by",
    "agg_percentiles", "agg_pivot", "agg_rollup", "filter_in_set",
    "filter_predicates", "join_anti", "join_asof", "join_asof_union",
    "join_broadcast_hint", "join_cross", "join_full_outer", "join_inner_star",
    "join_left_outer", "join_multikey", "join_right_outer", "join_semi",
    "join_skew_salted", "join_theta_range", "project_distinct",
    "q1_pricing_summary", "scalar_array", "scalar_array_fold", "scalar_datetime",
    "scalar_math", "scalar_string", "set_except", "set_intersect",
    "set_union_all", "set_union_distinct", "sort_multi_nulls", "sort_topk",
    "win_first_last", "win_lag_lead", "win_nth_value", "win_ntile",
    "win_pct_rank", "win_range_frame", "win_rank_dense", "win_running_sum",
    "win_topk_per_group",
}
# Names the driver verified in round 2 (CORRECTNESS_r02.json: 48 hash_match +
# 2 declared rows-only). Appended so round 3's budget-capped walk lands on the
# 34 never-checked entries plus scalar_conditional (fixed in 007a035 but never
# driver-re-checked).
_R2_VERIFIED = {
    "cdc_materialize", "cdc_dedup_latest_window", "cdc_filter_tables",
    "cdc_next_position", "cdc_envelope_shape", "dedup_exact", "dedup_exact_hash",
    "dedup_fingerprint", "text_winnow_fingerprints", "dedup_winnow_pairs",
    "dedup_lsh_scaled", "dedup_clusters", "text_fingerprint_rolling",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_embedding_cosine", "sim_topk_bruteforce", "sim_topk_ivf",
    "sim_embedding_stats", "text_lang_stats", "text_quality", "text_lang_id",
    "text_pii_scrub", "text_repetition", "dedup_semantic_clusters",
    "text_lang_confusion", "chunk_documents", "pack_sequences",
    "contamination_ngrams", "dedup_cross_corpus", "sample_stratified_hash",
    "rollup_timeseries", "join_range_bucketed", "text_quality_model",
    "pipeline_curation", "dedup_keep_best", "text_unigram_logprob",
    "text_token_stats", "text_markup_strip", "scalar_url_parse",
    "text_vocab_topk", "split_train_val_test", "shuffle_deterministic",
    "dedup_lines_global", "events_retention", "join_fuzzy_edit1",
    "join_overlap_intervals", "multimodal_features", "multimodal_frame_plan",
}
_DRIVER_VERIFIED = _R1_VERIFIED | _R2_VERIFIED

# Queries first registered in round 3 (post-r2 driver run). They are
# unverified too, but the r1/r2-era entries that have NEVER had a driver row
# (the 34 + scalar_conditional the r2 verdict calls out) must win the
# budget-capped walk — new additions take whatever slots remain and rotate
# into r4 otherwise.
_R3_NEW = {
    "cdc_tx_filter", "cdc_stamp_filename", "sim_centroid_by_label",
    "embed_quantize_int8", "dedup_url_canonical", "text_bigram_logprob",
    "multimodal_frame_dedup", "stream_heavy_hitters", "events_funnel_strict",
    "events_markov_transitions", "q2_min_cost_supplier",
    "q4_order_priority", "q18_large_orders",
    "q10_returned_items", "q12_priority_lines", "q14_promo_revenue",
    "q19_discount_revenue", "cdc_scd2_history", "cdc_time_travel",
    "cdc_churn_stats", "text_tfidf_topk", "text_bpe_pairs", "index_inverted",
    "q7_volume_shipping", "q9_product_profit", "q15_top_supplier",
    "dedup_suffix_containment", "text_concordance", "graph_pagerank_3iter",
    "scalar_interval_arith", "join_nullsafe", "agg_filter_clause",
    "win_cume_dist", "events_cohort_retention",
}


def _rank(n: str) -> int:
    if n in _DRIVER_VERIFIED:
        return 2
    return 1 if n in _R3_NEW else 0


_reordered = {n: REGISTRY[n] for n in sorted(REGISTRY, key=_rank)}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "queries", "oracle_sql"]
