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

# Exact ordering refinement: names the driver fully verified in a past round
# (CORRECTNESS_r{N}.json hash_match, with code/oracle unchanged since) move
# to the END of the registry so a budget-capped walk spends its budget on the
# not-yet-verified entries.
#
# Maintenance invariant (per round N):
#   1. append round N's hash_match-green names to a new _R{N}_VERIFIED set;
#   2. REMOVE from every _R*_VERIFIED set any name whose builder or oracle
#      changed since its green row (stale evidence = never green);
#   3. register new round-(N+1) queries in a fresh _R{N+1}_NEW set so they
#      queue BEHIND the pre-existing never-green backlog.
# Anything not covered by a set lands in the never-green backlog by
# construction (computed below), so a forgotten registration can only make a
# query be checked EARLIER, never hide it.
# _R1_VERIFIED is EMPTY as of round 8: the r7 driver walk re-certified all
# 20 remaining r1-vintage rows (their freshest green rows now live in
# _R7_VERIFIED), completing the rotation goal the r6 verdict set.
_R1_VERIFIED: set = set()
# Moved OUT of _R1_VERIFIED to _R6_VERIFIED (re-certified by the r6 driver
# walk): the 27 agg/filter/join_asof/q1/scalar/win names whose freshest green
# row is now CORRECTNESS_r06.json.
# Removed from _R1_VERIFIED (stale evidence): win_ntile (rewritten to the
# two-phase scale-safe form after its r1 green), agg_approx_distinct (was
# rows-only, never hash-green; has a value-level oracle as of r4).
# Names the driver verified in round 2 (CORRECTNESS_r02.json: 48 hash_match +
# 2 declared rows-only). Appended so round 3's budget-capped walk lands on the
# 34 never-checked entries plus scalar_conditional (fixed in 007a035 but never
# driver-re-checked).
# _R2_VERIFIED is EMPTY as of round 9: the r8 driver walk re-certified all
# 25 remaining r2-vintage rows (their freshest green rows now live in
# _R8_VERIFIED), completing the rotation goal the r7 verdict set.
_R2_VERIFIED: set = set()
# Moved OUT of _R2_VERIFIED to _R7_VERIFIED (re-certified by the r7 driver
# walk): the 13 dedup/fingerprint/similarity/text names whose freshest green
# row is now CORRECTNESS_r07.json. The 25 literals above are the whole
# remaining r2 tier — the r8 rotation target is to empty it.
# Removed from _R2_VERIFIED (stale evidence): dedup_semantic_clusters +
# dedup_embedding_cosine (r6 sf0.1 timing census: per-pair norm folds moved
# to per-row precompute before the blocking join — value-identical, locally
# re-gated green, but the builder source changed); dedup_simhash (rows-only in r2,
# got a value-level oracle in r3 — never hash-green), multimodal_features
# (oracle's VARCHAR->BLOB byte counting rewritten to escape-safe encode() in
# r5 — needs a fresh row), sim_topk_ivf (rows-only
# in r2, exact oracle as of r4 — never hash-green), events_retention (cohort
# column re-typed DATE -> TIMESTAMP in r4 to survive dtype-sensitive
# canonicalization — needs a fresh driver row).

# Names the driver hash-verified in round 3 (CORRECTNESS_r03.json: 47 green
# of 50 checked; the 3 non-green — events_sessionize, scalar_higher_order,
# agg_hll_mergeable — stay in the never-green backlog). Removed for stale
# evidence: cdc_stamp_filename (rewritten r4 from the global window to the
# broadcast as-of form) and cdc_tx_filter (rewritten r4 to the two-phase
# distributed prefix scan) — both need fresh driver rows.
# Removed from _R3_VERIFIED (stale evidence): multimodal_metadata (same r5
# escape-safe encode() oracle rewrite as multimodal_features);
# cdc_time_travel (r6 _unpack_winner refactor of materialize(), see the
# _R5_VERIFIED note); events_ewma (r7: the in-group fold swapped from a
# per-row Python loop to pandas ewm(alpha, adjust=False) — same recurrence
# in C, hash-identical through the 6dp rounding, locally re-gated green,
# but the builder changed; the scale case is million-row groups where the
# Python loop dominates — at sf0.1 group sizes the A/B was neutral).
# _R3_VERIFIED is EMPTY as of round 10: the r9 driver walk re-certified all
# 32 remaining r3-vintage rows (their freshest green rows now live in
# _R9_VERIFIED), completing the rotation goal the r8 verdict set.
_R3_VERIFIED: set = set()
# Moved OUT of _R3_VERIFIED to _R8_VERIFIED (re-certified by the r8 driver
# walk): cdc_scd2_history, cdc_churn_stats, sim_centroid_by_label,
# embed_quantize_int8, text_tfidf_topk, text_bpe_pairs, index_inverted,
# dedup_suffix_containment, text_concordance, graph_pagerank_3iter — the 32
# literals above are the whole remaining r3 tier; the r9 rotation target
# (per the r8 verdict) is to empty it and re-certify >=3 of r4.
# Names the driver hash-verified in round 4 (CORRECTNESS_r04.json: 50 of 50
# checked, all hash_match — the whole r3 backlog + all of _R4_NEW).
# Removed from _R4_VERIFIED (stale evidence): cdc_stamp_filename (the r6
# sf0.1 timing census caught its broadcast-join linear scan at 254.6 s;
# stamp_binlog_filename was rewritten to the chunked literal lookup and
# locally re-gated green at 3 scales — needs a fresh driver row).
# Moved OUT of _R4_VERIFIED to _R9_VERIFIED (re-certified by the r9 driver
# walk): cdc_tx_filter, dedup_simhash, sim_topk_ivf, text_char_entropy.
# _R4_VERIFIED is EMPTY as of round 11: the r10 driver walk re-certified all
# 43 remaining r4-vintage rows (their freshest green rows now live in
# _R10_VERIFIED), completing the rotation goal the r9 verdict set.
_R4_VERIFIED: set = set()
# Removed from _R4_VERIFIED (r7): events_changepoint_cusum — proactively
# hardened against the agg_pareto_abc flake class (the parallel avg now
# eps-rounds before the cusum walk accumulates it); value-identical at the
# output rounding, re-gated green at 3 scales, fresh driver row queued.
# Removed from _R4_VERIFIED (stale evidence, r7 edit): sim_ann_hyperplane —
# functions/similarity.hyperplane_signature now ships each plane as one
# constant-folded split+cast literal instead of a per-row CreateArray
# (values identical, locally re-gated green at 3 scales, but the builder's
# plan changed) — re-queues in the never-green backlog for a fresh row.
# Names the driver hash-verified in round 5 (CORRECTNESS_r05.json: 50 of 50
# checked, all hash_match — the whole 16-name r4-late backlog, all 29 _R5_NEW
# registrations, and 5 CDC re-checks whose latest green row is now r5, so
# they moved here OUT of _R2_VERIFIED: cdc_materialize,
# cdc_dedup_latest_window, cdc_envelope_shape, cdc_filter_tables,
# cdc_next_position).
# Removed from _R5_VERIFIED (r7): agg_pareto_abc — ONE flaky sweep mismatch
# traced to the unrounded part-revenue rollup feeding the running-sum
# window: the double sum's last ulp varies with Spark's shuffle arrival
# order run-to-run, and a part sitting exactly on the 0.7/0.9 class edge
# flipped class. The rollup is now eps-rounded BEFORE the window on both
# engines (re-gated green 3x at sf0.01 + both other scales); fresh driver
# row required.
# Removed from _R5_VERIFIED (stale evidence, r6 edits): customer_rfm_scores
# (builder now unpersists the RFM rollup after the ntile passes);
# events_interval_merge (operators/intervals.merge_intervals now drops
# null-bounded intervals to match the streaming twin, and the oracle
# mirrors the filter); cdc_materialize + cdc_consistency_check (the
# materialize() tail was factored into _unpack_winner — semantics
# identical and locally re-gated green, but the builder source changed).
# All re-queue in the never-green backlog for a fresh driver row.
# _R5_VERIFIED is EMPTY as of round 12: the r11 driver walk re-certified
# all 45 remaining r5-vintage rows (their freshest green rows now live in
# _R11_VERIFIED), completing the rotation goal the r10 verdict set.
_R5_VERIFIED: set = set()
# NOTE: the r5 CDC re-checks live in _R5_VERIFIED when verified (their
# freshest green row) and are intentionally absent from the _R2_VERIFIED
# literal above; cdc_materialize was evicted to never-green by the r6
# _unpack_winner refactor, then re-greened by the r6 driver walk — its
# freshest row now lives in _R6_VERIFIED.
# _R6_VERIFIED is EMPTY as of round 13: the r12 driver walk re-certified
# all 47 remaining r6-vintage rows (their freshest green rows now live in
# _R12_VERIFIED), completing the rotation goal the r11 verdict set.
_R6_VERIFIED: set = set()
# Removed from _R6_VERIFIED (stale evidence, r7 edits):
# dedup_minhash_accuracy (builder refactored onto
# functions/dedup.minhash_accuracy_audit to grow the sample_frac/max_pairs
# audit-sampling knobs — values identical, full population still the
# registered default, but the builder source changed, so it re-queues in
# the never-green backlog for a fresh driver row);
# dedup_semantic_clusters (the r7 census caught connected_components
# re-evaluating its whole candidate-generation lineage per iteration —
# sym is now checkpointed once, 19.3 -> 9.3 s warm at sf0.1; labels
# identical, locally re-gated green, but the shared helper changed —
# same eviction applies to dedup_clusters in the r2 tier).

# _R7_VERIFIED is EMPTY as of round 14: the r13 driver walk re-certified
# all 44 remaining r7-vintage rows (their freshest green rows now live in
# _R13_VERIFIED), completing the rotation goal the r12 verdict set.
_R7_VERIFIED: set = set()
# Removed from _R7_VERIFIED (stale evidence, r8 edits):
# dedup_jaccard_containment (grew the same sample_frac/max_pairs knobs its
# minhash_accuracy_audit sibling got in r7 — full population stays the
# registered default, values identical, but the builder source changed);
# events_overdispersion (the `overdispersed` boolean now derives from the
# eps-rounded fano on both engines per the r7 review advice — a hard
# decision no longer reads an unrounded parallel-aggregate ratio);
# events_ewma (the non-null-value precondition the r7 review named is now
# ASSERTED inside the fold — pandas ewm would skip a NaN the old Python
# loop propagated; no behavior change on the NOT NULL testdata);
# dedup_minhash_accuracy (its candidate-subset knobs were extracted into
# the shared functions/dedup.subset_candidate_pairs — same plan, but the
# builder's call path changed).
_R7_VERIFIED -= {
    "dedup_jaccard_containment", "events_overdispersion", "events_ewma",
    "dedup_minhash_accuracy",
}
# Removed from _R6_VERIFIED (stale evidence, r8 edit): join_bloom_prefilter
# — build_bloom's word collect moved from py4j Row objects to the Arrow
# path (toPandas + one vectorized scatter), closing the r7 review's
# 2^27-cap driver-overhead item; bits identical, but the build source
# changed.
_R6_VERIFIED -= {"join_bloom_prefilter"}

# _R8_VERIFIED is EMPTY as of round 15: the r14 driver walk re-certified
# all 44 remaining r8-vintage rows (their freshest green rows now live in
# _R14_VERIFIED), completing the rotation goal the r13 verdict set.
_R8_VERIFIED: set = set()
# Removed from _R7_VERIFIED (stale evidence, r9 edit): dedup_minhash_lsh —
# the builder docstring now states the at-volume guidance the r8 sf1 run
# measured (plain form is duplicate-quadratic; dedup_lsh_scaled is the
# facade default and the form to run at volume). Values identical — the
# query body is untouched — but the builder source changed.
# (dedup_minhash_lsh was re-greened by the r9 driver walk; its freshest row
# now lives in _R9_VERIFIED.)
_R7_VERIFIED -= {"dedup_minhash_lsh"}
# Removed from _R7_VERIFIED (r13 — a LIVE flake, not just stale evidence):
# agg_pareto_abc failed 1 of 2 closing-sweep runs (green on re-run; 0/10
# in a fresh session). Mechanism found and fixed: the partition TOTAL was
# an order-free SUM() OVER (PARTITION BY) whose parallel fold re-adds the
# rounded addends in arrival order — its last ulp moved a boundary part's
# 9dp-rounded share across the 0.7 class edge. The total is now
# MAX(cum_rev) (the last value of the order-pinned running sum) on both
# engines; fresh driver row required.
_R7_VERIFIED -= {"agg_pareto_abc"}

# _R9_VERIFIED is EMPTY as of round 16: the r15 driver walk re-certified
# all 43 remaining r9-vintage rows (CORRECTNESS_r15.json, all hash_match);
# they live in _R15_VERIFIED, completing the rotation goal the r14
# verdict set. (Historical note: the tier originally held 50 names from
# the round-9 walk — 9 _R9_NEW registrations, the 5-name never-green
# backlog, the 32 remaining r3-vintage rows, and 4 r4 re-certs.)
_R9_VERIFIED: set = set()
# Removed from _R9_VERIFIED (stale evidence, r10 edits):
# join_bucketed_colocated — the one-time bucketed layout is factored out of
# the query hot path (build-once keyed by dataset fingerprint, r9 verdict
# item 4) and the returned aggregate is now built while the SMJ conf is
# still in force with an explicit merge hint, so the EXECUTED plan matches
# the asserted Exchange-free invariant (r9 ADVICE item 1; items 2's
# unique-per-run names/rmtree race fixed in the same rewrite);
# agg_spearman_corr — moment sums now accumulate in decimal(38,0) as the
# docstring always claimed (r9 ADVICE item 4: plain doubled-midrank sums
# previously widened only to decimal(29,0); values identical on every
# plausible input, but overflow now fails loudly instead of silently);
# text_perplexity — docstring now states the Zipf-small vocab-broadcast
# assumption and the shuffle-join swap at open-vocab scale (r9 verdict
# item 5; query body untouched);
# sim_ivfpq_recall — now a dial SWEEP: (nprobe, shortlist) legs sharing
# one trained index, each emitting a dial-table-compatible row, per the
# r9 verdict item 3 (the sf0.1 recall gap);
# sim_ivfpq_topk — values and plan unchanged, but the shared serving
# helper was split into index/query stages to support the sweep, so the
# builder's call path changed (the r8 dedup_minhash_accuracy precedent).
_R9_VERIFIED -= {
    "join_bucketed_colocated", "agg_spearman_corr", "text_perplexity",
    "sim_ivfpq_recall", "sim_ivfpq_topk",
}
# Moved OUT of _R9_VERIFIED to _R14_VERIFIED (re-certified by the r14
# driver walk's two spare slots after the 1-name budget + 44-name r8
# tier): cdc_tx_filter, dedup_minhash_lsh.
_R9_VERIFIED -= {"cdc_tx_filter", "dedup_minhash_lsh"}
# NOT evicted for the r10 global_prefix_sums edit (agg_ks_test,
# agg_gini_lorenz, agg_mann_whitney): the change is pure-Python argument
# validation that RAISES before any plan is built, on argument shapes no
# registered builder uses — the four consumers' full `extended` explain
# output was A/B-captured before/after the edit and diffed BYTE-IDENTICAL
# (recorded in COVERAGE.md r10), unlike the r9 prefix-scan edit which
# restructured the shared plan and did evict. Spending 3 of the 50 driver
# slots here would leave 3 r4-vintage rows stale, defeating the r9
# verdict's explicit rotation target (eviction+new <= 7); both queries
# also re-pass the full sf0.01 sweep x2 and the sf0.1 census this round.
# Removed from _R8_VERIFIED (stale evidence, r10 edit): text_unigram_logprob
# — same vocab-broadcast docstring paragraph as text_perplexity (r9 verdict
# item 5; query body untouched).
_R8_VERIFIED -= {"text_unigram_logprob"}

# Names the driver hash-verified in round 10 (CORRECTNESS_r10.json: 50 of 50
# checked, all hash_match): the 1 _R10_NEW registration, the 6-name
# never-green backlog (the r10-evicted ivfpq dial-sweep pair, the build-once
# bucketed join, the decimal(38) spearman widening, the two vocab-broadcast
# docstring re-greens), and all 43 remaining r4-vintage rows (r4 tier now
# EMPTY).
_R10_VERIFIED = {
    "agg_approx_distinct", "agg_filter_clause", "agg_hll_mergeable",
    "agg_quantile_mergeable", "agg_spearman_corr", "agg_welch_ttest",
    "embed_matryoshka", "embed_pq_codes", "events_anomaly_mad",
    "events_cohort_retention", "events_funnel_strict",
    "events_markov_transitions", "events_retention", "events_sessionize",
    "join_bucketed_colocated", "join_nullsafe",
    "multimodal_ahash_neardup_scaled", "multimodal_frame_dedup",
    "q10_returned_items", "q11_important_parts", "q12_priority_lines",
    "q13_order_counts", "q14_promo_revenue", "q15_top_supplier",
    "q16_parts_suppliers", "q17_small_qty_revenue", "q18_large_orders",
    "q19_discount_revenue", "q20_part_promotion", "q21_waiting_suppliers",
    "q22_sales_opportunity", "q2_min_cost_supplier", "q4_order_priority",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "rollup_ohlc", "sample_temperature_mix", "scalar_higher_order",
    "scalar_interval_arith", "search_hybrid_rrf", "sim_ivfpq_recall",
    "sim_ivfpq_topk", "source_xml_scan", "stream_heavy_hitters",
    "text_bm25_topk", "text_perplexity", "text_unigram_logprob",
    "win_cume_dist", "win_ntile",
}
# Removed from _R10_VERIFIED (stale evidence, r11 edit):
# join_bucketed_colocated — generation GC moved OUT of the query hot path
# (r10 advice: a query-time DROP TABLE would fail a concurrent reader
# mid-scan on the old generation; gc_layouts is now an out-of-band
# maintenance step). Values identical — the join/aggregate body is
# untouched — but the builder source changed.
_R10_VERIFIED -= {"join_bucketed_colocated"}
# Removed from _R10_VERIFIED (stale evidence, r11 edit): sim_ivfpq_topk —
# the registered serve path now runs at the CALIBRATED dial the r10 sweep
# recommends (r10 verdict item 2): nprobe=4 and shortlist derived from
# corpus size (max(32, ceil(n / cells)), the sim_ivfpq_recall scaling
# rule) instead of the fixed r9 (2, 32) whose measured recall@5 had
# decayed to .369 at sf0.1. Output rows change (better neighbors), the
# oracle derives the same dial in SQL — needs a fresh driver row.
_R10_VERIFIED -= {"sim_ivfpq_topk"}
# Moved OUT of _R10_VERIFIED to _R15_VERIFIED (re-certified by the r15
# driver walk's four spare slots after the 3-name budget + 43-name r9
# tier): embed_matryoshka, embed_pq_codes, search_hybrid_rrf,
# text_bm25_topk.
_R10_VERIFIED -= {
    "embed_matryoshka", "embed_pq_codes", "search_hybrid_rrf",
    "text_bm25_topk",
}
# Removed from _R10_VERIFIED (stale evidence, r13 edit): sim_ivfpq_recall
# — the shared index (_ivfpq_index) is now built at the DERIVED cells
# (= round(sqrt(n)), per the r12 verdict item 3: the r12 cells probe
# measured the sqrt rule dominating the 8-cell pin at two corpus sizes),
# and train_sample_mod now also bounds the coarse Lloyd trainer (the
# registered path keeps the full-corpus default). Cell geometry changes
# every shortlist, so output rows change; the oracle derives the same
# cells in its ncells CTE — locally re-gated green at all 3 scales,
# fresh driver row required. (sim_ivfpq_topk, the same certified path,
# is removed from _R11_VERIFIED below.)
_R10_VERIFIED -= {"sim_ivfpq_recall"}

# Names the driver hash-verified in round 11 (CORRECTNESS_r11.json: 50 of
# 50 checked, all hash_match): all 3 _R11_NEW registrations, the 2-name
# never-green backlog (sim_ivfpq_topk at the calibrated serving dial,
# join_bucketed_colocated with GC out of the hot path), and the whole
# 45-name r5 tier (r5 now EMPTY).
_R11_VERIFIED = {
    "agg_assoc_lift", "agg_corr_covar", "agg_countmin_sketch",
    "agg_entropy_gini", "agg_kendall_mergeable", "agg_kendall_tau",
    "agg_regr_linear", "agg_string_agg", "agg_weighted_median",
    "cdc_dedup_latest_window", "cdc_envelope_shape", "cdc_filter_tables",
    "cdc_key_bucket_policy", "cdc_key_hotspots", "cdc_next_position",
    "cdc_op_rollup", "dedup_paragraphs", "dedup_simhash_banded",
    "embed_kmeans_step", "embed_norm_outliers", "events_ab_srm",
    "events_autocorr", "events_calendar_grid", "events_dwell_time",
    "events_gapfill", "events_inactive_users", "events_streak_longest",
    "events_top_paths", "export_shard_manifest", "graph_triangle_count",
    "join_asof_tolerance", "join_bucketed_colocated", "multimodal_features",
    "multimodal_format_sniff", "multimodal_metadata",
    "orders_seasonality_index", "profile_columns", "rollup_mom_growth",
    "sample_reservoir_hash", "sample_time_split", "scalar_variant",
    "sim_ivfpq_topk", "sql_pipe_syntax", "sql_recursive_cte",
    "text_gopher_rules", "text_sentence_stats", "text_stopword_docfreq",
    "udf_arrow_scalar", "udf_map_in_arrow", "win_time_range_frame",
}
# Removed from _R11_VERIFIED (stale evidence, r12 edits — the r11 ADVICE
# fixes changed these builders' certified paths; values identical at any
# testable scale and locally re-gated green, but fresh driver rows are the
# durable record):
# - agg_kendall_tau + agg_kendall_mergeable: kendall_tau_from_cells'
#   output projection now coalesces empty-input counts to exact 0 and
#   RAISES past the bigint output bound instead of the silent NULL of a
#   non-ANSI decimal->bigint cast (functions/stats.py).
# - cdc_key_bucket_policy: suggest_key_bucket's ceilings moved from float
#   math.ceil to exact integer (a+b-1)//b — now agreeing with the
#   declarative twin past 2^53; the query self-checks the helper, so the
#   helper IS part of the certified path.
_R11_VERIFIED -= {
    "agg_kendall_tau", "agg_kendall_mergeable", "cdc_key_bucket_policy",
}
# Removed from _R11_VERIFIED (stale evidence, r13 edit): sim_ivfpq_topk —
# same derived-cells index change as the sim_ivfpq_recall eviction above
# (the registered serve path now trains at cells = round(sqrt(n)) and
# derives its shortlist against that count).
_R11_VERIFIED -= {"sim_ivfpq_topk"}

# Names the driver hash-verified in round 12 (CORRECTNESS_r12.json: 50 of
# 50 checked, all hash_match): the whole 3-name never-green backlog (the
# r11-advice-fix evictions: agg_kendall_tau, agg_kendall_mergeable,
# cdc_key_bucket_policy) and the entire 47-name r6 tier (r6 now EMPTY).
_R12_VERIFIED = {
    "agg_collect_sorted", "agg_count_distinct", "agg_cube", "agg_global",
    "agg_gmean_hmean", "agg_grouping_sets", "agg_having",
    "agg_hhi_concentration", "agg_kendall_mergeable", "agg_kendall_tau",
    "agg_max_by", "agg_percentiles", "agg_rollup", "cdc_consistency_check",
    "cdc_key_bucket_policy", "cdc_materialize", "cdc_materialize_salted",
    "cdc_stamp_filename", "cdc_time_travel", "customer_rfm_scores",
    "dedup_embedding_cosine", "embed_debias_apply", "embed_debias_topdir",
    "embed_kmeans_converged", "embed_pca_power", "events_gap_percentiles",
    "events_hourly_profile", "events_interval_merge", "filter_in_set",
    "filter_predicates", "join_asof", "join_asof_union",
    "multimodal_resolution_buckets",
    "orders_backlog_timeseries", "q1_pricing_summary", "sample_weighted_topk",
    "scalar_array", "scalar_array_fold", "scalar_datetime", "scalar_math",
    "scalar_string", "text_pmi_cooccurrence", "win_first_last",
    "win_lag_lead", "win_nth_value", "win_pct_rank", "win_range_frame",
    "win_rank_dense", "win_running_sum", "win_topk_per_group",
}
# (join_bloom_prefilter is NOT here: its r6 green was evicted by the r8
# Arrow-collect rebuild and its freshest row lives in _R8_VERIFIED.)

# Names the driver hash-verified in round 13 (CORRECTNESS_r13.json: 50 of
# 50 checked, all hash_match): both _R13_NEW registrations
# (cdc_hash_bucket_policy, sim_ann_dial_policy), the whole 3-name
# never-green backlog (the derived-cells ivfpq pair + the agg_pareto_abc
# live-flake fix), all 44 remaining r7-vintage rows (r7 tier now EMPTY),
# and 1 r8-vintage re-certification (cdc_scd2_history, the spare slot).
_R13_VERIFIED = {
    "agg_bool", "agg_bootstrap_ci", "agg_pareto_abc", "agg_pivot",
    "cdc_hash_bucket_policy", "cdc_scd2_history", "cdc_seq_gap_audit",
    "dedup_clusters", "dedup_exact", "dedup_exact_hash",
    "dedup_fingerprint", "dedup_lsh_scaled", "dedup_ngram_jaccard",
    "dedup_semantic_clusters", "dedup_winnow_pairs", "embed_norm_clip",
    "events_changepoint_cusum", "join_anti", "join_broadcast_hint",
    "join_cross", "join_full_outer", "join_inner_star", "join_left_outer",
    "join_multikey", "join_right_outer", "join_semi", "join_skew_salted",
    "join_theta_range", "multimodal_payload_dedup", "project_distinct",
    "sample_balanced_classes", "set_except", "set_intersect",
    "set_union_all", "set_union_distinct", "sim_ann_dial_policy",
    "sim_ann_hyperplane", "sim_ann_recall_curve", "sim_embedding_stats",
    "sim_ivfpq_recall", "sim_ivfpq_topk", "sim_topk_bruteforce",
    "sort_multi_nulls", "sort_topk", "text_fingerprint_rolling",
    "text_js_divergence", "text_lang_stats", "text_quality",
    "text_winnow_fingerprints", "text_zipf_fit",
}
# Removed from _R13_VERIFIED (stale evidence, r14 edit): the three
# oracle-replay-bound ANN rows — sim_ann_recall_curve, sim_ivfpq_recall,
# sim_ivfpq_topk — whose oracle text gained MATERIALIZED annotations on
# the shared CTE stages (r13 verdict item 6: gate-cost hygiene). Values
# are unchanged by construction and were A/B-verified identical at sf0.1
# (DuckDB side 53.6/11.9/13.2 s -> 0.8/2.4/1.6 s), but the ORACLE text is
# part of the certified identity, so fresh driver rows are required.
# (The r14 _ivfpq_index docstring update — the engagement-point trainer
# trade, SCALE.md r14 prediction 3 — is covered by the same two ivfpq
# evictions: _ivfpq_index's only registered consumers are these rows.)
_R13_VERIFIED -= {
    "sim_ann_recall_curve", "sim_ivfpq_recall", "sim_ivfpq_topk",
}
# Removed from _R13_VERIFIED (r15 — a LIVE flake, the class's THIRD
# catch): agg_pareto_abc failed 1 of 2 re-verify sweeps (green on
# re-run; 0/12 in a dedicated repro session). Mechanism found by exact
# audit, different site than r7 (unrounded addends) and r13 (order-free
# partition total): the OUTPUT aggregate summed 4dp-QUANTIZED class
# revenues in float — the exact sum lands on a .xx50 half-cent boundary
# with prob ~1/100 per group (NATION_13/B = 11572169.1050 exactly at
# sf0.01) and at ~1e7-1e8 magnitudes one ulp exceeds the 1e-9 nudge, so
# the fold's arrival order decided the 2dp rounding. class_revenue now
# folds in exact DECIMAL(38,4) before the coarser round on both engines;
# a registry-wide lint pins the shape out
# (tests/test_orderfree_fold_lint.py::test_no_requantized_float_group_sums_in_registry).
# Fresh driver row required.
_R13_VERIFIED -= {"agg_pareto_abc"}

# Names the driver hash-verified in round 14 (CORRECTNESS_r14.json: 50 of
# 50 checked, all hash_match): the 1 _R14_NEW registration
# (cdc_auto_layout_policy), the 3-name never-green backlog (the
# MATERIALIZED-oracle ANN evictions), all 44 remaining r8-vintage rows
# (r8 tier now EMPTY), and 2 r9-vintage re-certifications (cdc_tx_filter,
# dedup_minhash_lsh).
_R14_VERIFIED = {
    "agg_chi2_independence", "cdc_auto_layout_policy", "cdc_churn_stats",
    "cdc_schema_evolution", "cdc_tx_filter", "chunk_documents",
    "contamination_ngrams", "dedup_cross_corpus",
    "dedup_jaccard_containment", "dedup_keep_best", "dedup_lines_global",
    "dedup_minhash_accuracy", "dedup_minhash_lsh",
    "dedup_suffix_containment", "embed_cosine_histogram",
    "embed_quantize_int8", "events_ewma", "events_overdispersion",
    "graph_pagerank_3iter", "index_inverted", "join_asof_nearest",
    "join_bloom_prefilter", "join_fuzzy_edit1", "join_overlap_intervals",
    "join_range_bucketed", "multimodal_frame_plan",
    "multimodal_image_ahash", "pack_sequences", "pipeline_curation",
    "rollup_timeseries", "sample_stratified_hash", "scalar_url_parse",
    "shuffle_deterministic", "sim_ann_recall_curve",
    "sim_centroid_by_label", "sim_ivfpq_recall", "sim_ivfpq_topk",
    "split_train_val_test", "text_boilerplate_share", "text_bpe_pairs",
    "text_concordance", "text_lang_confusion", "text_lang_id",
    "text_markup_strip", "text_pii_scrub", "text_quality_model",
    "text_repetition", "text_tfidf_topk", "text_token_stats",
    "text_vocab_topk",
}
# Removed from _R14_VERIFIED (stale evidence, r15 edits):
# cdc_auto_layout_policy — the certified seed rule changed TWICE over:
# derive_auto_policy's range leg now shares the hash leg's three-term
# count rule (the r14 ADVICE item 1 degenerate small-seed guard: floor at
# ceil(k / share), cap at max_buckets) with the whole observation folded
# into ONE aggregate, and the oracle text changed with it (a third
# 'numeric_small' scenario exercising the floor live, plus the share/cap
# literals now f-strung from the sink's AUTO_* constants per r14 ADVICE
# item 4). Locally re-gated green at all 3 scales; fresh driver row
# required.
_R14_VERIFIED -= {"cdc_auto_layout_policy"}

# Removed from _R13_VERIFIED (stale evidence, r16 edit):
# cdc_hash_bucket_policy — suggest_hash_bucket_count's anti-blanketing
# floor moved from float math.ceil(k / share) to exact integer division
# over the share's binary expansion (_ceil_div_share, r15 ADVICE item 3).
# The registered builder never passes expected_keys_per_batch, so the
# changed branch is outside its exercised path and values are identical
# — but the row self-checks the helper, so the helper IS part of the
# certified path (the r11 cdc_key_bucket_policy precedent: same class of
# ceiling-arithmetic change, same eviction call).
_R13_VERIFIED -= {"cdc_hash_bucket_policy"}

# Names the driver hash-verified in round 15 (CORRECTNESS_r15.json: 50 of
# 50 checked, all hash_match): the 1 _R15_NEW registration
# (cdc_bucket_growth_policy), the 2-name never-green backlog
# (cdc_auto_layout_policy — the r15 range-leg rule change;
# agg_pareto_abc — the r15 exact-decimal-fold flake fix), all 43
# remaining r9-vintage rows (r9 tier now EMPTY), and 4 r10-vintage
# re-certifications (embed_matryoshka, embed_pq_codes, search_hybrid_rrf,
# text_bm25_topk).
_R15_VERIFIED = {
    "agg_gini_lorenz", "agg_histogram", "agg_ks_test", "agg_mann_whitney",
    "agg_mode_deterministic", "agg_pareto_abc", "agg_stats_moments",
    "agg_theil_decomposed", "cdc_auto_layout_policy",
    "cdc_bucket_growth_policy", "dedup_simhash", "dedup_url_canonical",
    "embed_matryoshka", "embed_pq_codes", "events_funnel",
    "join_lateral_topk", "layout_zorder", "multimodal_ahash_neardup",
    "multimodal_audio_windows", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "reshape_unpivot", "scalar_bitwise",
    "scalar_conditional", "scalar_encode_decode", "scalar_json",
    "scalar_json_struct", "scalar_struct_map", "scalar_try_errors",
    "search_hybrid_rrf", "sim_topk_ivf", "source_csv_scan",
    "source_jsonl_scan", "source_orc_scan", "stream_dedup_first",
    "stream_session_window", "stream_sliding_window",
    "stream_tumbling_window", "text_bigram_logprob", "text_bm25_topk",
    "text_char_entropy", "text_hashed_features", "train_mixture_weights",
    "udf_grouped_agg", "udf_grouped_map_zscore", "udf_pandas_scalar",
    "udf_python_scalar", "udf_python_udtf", "udf_table_function",
}
# Removed from _R15_VERIFIED (stale evidence, r16 edits):
# cdc_auto_layout_policy — derive_auto_policy's floor term moved to the
# same exact integer arithmetic (_ceil_div_share) and its body was
# factored into _observe_ids + _policy_from_observation so
# suggest_migration's re-derivation shares the seed rule by construction
# (values identical at the power-of-two default share, locally re-gated
# green at all 3 scales, but the self-checked helper's source changed);
# cdc_bucket_growth_policy — the certified decision rule GAINED the
# density fallback (r15 verdict item 2): a re-derived RANGE candidate is
# censused against the same growth threshold, and the rule falls back to
# HashKeyBucket at the three-term count when that census exceeds BOTH
# the threshold AND the ceil(n/nb) uniform spread (the second conjunct
# is the r16 30M prediction-3 catch: a cap-bound uniform domain keeps
# the range candidate); the row adds a third 'clustered' scenario +
# cand_max/unif_max/new_kind columns and the oracle text changed with
# it. Locally re-gated green at all 3 scales; fresh driver rows
# required.
_R15_VERIFIED -= {"cdc_auto_layout_policy", "cdc_bucket_growth_policy"}
# Removed from _R15_VERIFIED (stale evidence, r16 edit):
# multimodal_ahash_neardup — docstring-only: the registered doc now
# carries the PEDAGOGICAL-TWIN banner the weak-twin policy requires
# (r15 verdict item 6; the r9 text_perplexity/dedup_minhash_lsh
# precedent: a docstring is part of the certified identity). Query body
# untouched, values identical.
_R15_VERIFIED -= {"multimodal_ahash_neardup"}

# Queries first registered in round 16: none — the round's new surface
# (the suggest_migration density fallback) is certified through the
# evicted-and-recertified cdc_bucket_growth_policy row plus the
# end-to-end streaming tests, not a new registry name.
# Budget check (r15 verdict cap: evictions + new <= 7, enforced by
# tests/test_docs_consistency.py): the walk order puts the 4 never-green
# evictions (cdc_auto_layout_policy, cdc_bucket_growth_policy,
# cdc_hash_bucket_policy — the r16 exact-ceil / density-fallback edits —
# and multimodal_ahash_neardup — the weak-twin banner) first, then the
# 43 remaining r10-tier names, so the r10 tier empties this round with
# 3 spare slots (<= 50).
_R16_NEW: set = set()

# The union is computed ONCE, after every tier literal (and eviction edit)
# is final — a snapshot taken before a later edit would leave a name in
# _DRIVER_VERIFIED but no tier, tripping the fail-safe rank-0 path (caught
# by review in r6).
_DRIVER_VERIFIED = (
    _R1_VERIFIED | _R2_VERIFIED | _R3_VERIFIED | _R4_VERIFIED | _R5_VERIFIED
    | _R6_VERIFIED | _R7_VERIFIED | _R8_VERIFIED | _R9_VERIFIED
    | _R10_VERIFIED | _R11_VERIFIED | _R12_VERIFIED | _R13_VERIFIED
    | _R14_VERIFIED | _R15_VERIFIED
)

# Never-green backlog, by construction: every registered name without
# current-code green driver evidence that is not a round-16 addition. A name
# accidentally left out of _R16_NEW falls in here and gets checked EARLIER —
# the failure mode is extra verification, never a skipped query.
_NEVER_GREEN = set(REGISTRY) - _DRIVER_VERIFIED - _R16_NEW

# Verified tiers ordered STALEST ROUND FIRST: driver evidence staleness is
# the only remaining correctness risk — r5-vintage green rows on evolving
# code. The budget-capped walk therefore spends its slack re-certifying the
# OLDEST green rows each round; a name re-verified in round N moves to that
# round's set, so the rotation naturally cycles through the registry.
_VERIFIED_STALEST_FIRST = (
    _R1_VERIFIED, _R2_VERIFIED, _R3_VERIFIED, _R4_VERIFIED, _R5_VERIFIED,
    _R6_VERIFIED, _R7_VERIFIED, _R8_VERIFIED, _R9_VERIFIED, _R10_VERIFIED,
    _R11_VERIFIED, _R12_VERIFIED, _R13_VERIFIED, _R14_VERIFIED,
    _R15_VERIFIED,
)


def _rank(n: str) -> int:
    if n in _NEVER_GREEN:
        return 0
    if n in _R16_NEW:
        return 1
    for i, tier in enumerate(_VERIFIED_STALEST_FIRST):
        if n in tier:
            return 2 + i
    # impossible by construction (_NEVER_GREEN is the registry minus the
    # other sets, so the tiers tile the registry) — but fail SAFE: an
    # unclassified name is checked first, never hidden.
    return 0


_reordered = {n: REGISTRY[n] for n in sorted(REGISTRY, key=_rank)}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "queries", "oracle_sql"]
