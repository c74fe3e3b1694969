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
_reordered = {n: REGISTRY[n] for n in REGISTRY if n not in _R1_VERIFIED}
_reordered.update({n: REGISTRY[n] for n in REGISTRY if n in _R1_VERIFIED})
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "queries", "oracle_sql"]
