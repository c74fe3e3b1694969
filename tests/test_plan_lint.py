"""Registry-wide physical-plan lint: no query may contain an UNPLANNED
cartesian or nested-loop join. The execution-time twin (zero
`WindowExec: No Partition Defined` warns over a full oracle sweep) is
asserted by the verify recipe; this pins the join side at ANALYSIS time
for every one of the registry's plans, so a future edit that silently
degrades an equi-join into a cross join fails CI instead of shipping an
O(n*m) plan to a 100 TB cluster.
"""

from __future__ import annotations

from dumpr_spark.operators.scale import explain_str
from dumpr_spark.queries import REGISTRY

# Every BroadcastNestedLoopJoin in the registry is a DELIBERATE broadcast of
# a tiny side (scalar aggregate, literal frame, or a declared cross/theta
# join) — the build side is bounded by construction, so the "nested loop"
# is O(n * tiny). Additions to this list require the same justification.
BNLJ_ALLOWED = {
    "agg_quantile_mergeable",   # 2-literal quantile frame broadcast
    "cdc_consistency_check",    # two 1-row checksum aggregates cross-joined
    "cdc_time_travel",          # scalar as-of cutoff broadcast
    "events_inactive_users",    # 1-row stream-horizon (max ts) broadcast
    "text_stopword_docfreq",    # 1-row corpus doc-count broadcast
    "sample_time_split",        # 1-row time-percentile cutoff broadcast
    "cdc_key_hotspots",         # 1-row change-total broadcast
    "agg_assoc_lift",           # 1-row part-count broadcast
    "orders_seasonality_index", # 1-row global-mean broadcast
    "join_cross",               # THE declared 5x5 cross query
    "join_theta_range",         # declared non-equi theta join, small dims
    "q11_important_parts",      # TPC-H Q11 scalar threshold broadcast
    "q22_sales_opportunity",    # TPC-H Q22 scalar avg-balance broadcast
    "sample_temperature_mix",   # per-source weight table broadcast
    "search_hybrid_rrf",        # 1-row query-vector broadcast
    "sim_topk_bruteforce",      # broadcast query batch vs corpus scan
    "sim_topk_ivf",             # broadcast centroid set
    "sim_ann_recall_curve",     # broadcast query batch + centroid set +
                                # 1-row hits x total scalar joins
    "agg_ks_test",              # 1-row (n1, n2) sample-size scalar broadcast
    "text_perplexity",          # 1-row corpus token-total broadcast (the
                                # unigram-LM normalizer, text_unigram_logprob
                                # pattern)
    "train_mixture_weights",    # two 1-row scalar broadcasts over the
                                # |domains|-row frame (token total + capped
                                # expected-token total)
    "agg_theil_decomposed",     # 1-row (n, s) grand-totals broadcast over
                                # the |nations|-row cell frame
    "agg_chi2_independence",    # 1-row (n, nr, nc) totals scalar broadcast
    "agg_gini_lorenz",          # 1-row (n, t) totals scalar broadcast
    "embed_cosine_histogram",   # declared theta pair join INSIDE the
                                # hash-bounded sample + 1-row total scalar
    "sim_ivfpq_topk",           # broadcast centroid set (Lloyd/ivf_assign)
    "sim_ivfpq_recall",         # same + brute-force exact leg's broadcast
                                # query batch + 1-row hits x total scalars

    "embed_kmeans_step",        # broadcast centroid set (ivf_assign)
    "embed_kmeans_converged",   # broadcast centroid set per Lloyd iteration
    "text_pmi_cooccurrence",    # 1-row corpus-count broadcast (scalar)
    "text_js_divergence",       # 1-row corpus-total broadcast (scalar)
    "embed_pca_power",          # 1-row norm broadcast per power step (scalar)
    "embed_debias_topdir",      # same scalar norm broadcast (2 power steps)
    "text_bm25_topk",           # 1-row (N, avgdl) stats broadcast
    "text_unigram_logprob",     # scalar corpus-total broadcast
    "agg_kendall_tau",          # distinct-x BROADCAST-crossed with
                                # distinct-y to densify the contingency
                                # grid (both margins tiny by the ordinal
                                # contract) + two 1-row tie-total scalars
    "agg_kendall_mergeable",    # same grid densification + tie scalars,
                                # over the merged per-day cell sketches
    "cdc_bucket_growth_policy", # 2-row pinned-policy frame + 1-row domain
                                # aggregate broadcast over the key census
}


# Window nodes with an EMPTY partition spec sort the whole input on one
# task — fine on a fixture, a stall at 100 TB. The runtime twin (zero
# `WindowExec: No Partition Defined` warns over a full sweep) only fires
# for plans that EXECUTE a global window; this rejects one at analysis
# time across every registry plan. No allowlist on purpose: every global
# running-order need in the repo has a two-phase distributed form
# (operators/ntile.py, the batch tx filter) — a new global window should
# use one, not get listed here.
GLOBAL_WINDOW_ALLOWED: set = set()


def _walk_plans(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk_plans(children.apply(i))
    subqueries = node.subqueries()
    for i in range(subqueries.size()):
        yield from _walk_plans(subqueries.apply(i))


def test_no_unpartitioned_windows(spark, sf_dir):
    offenders = []
    for name, q in REGISTRY.items():
        plan = q.fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan()
        for node in _walk_plans(plan):
            if (
                node.getClass().getSimpleName() == "Window"
                and node.partitionSpec().size() == 0
                and name not in GLOBAL_WINDOW_ALLOWED
            ):
                offenders.append(name)
                break
    assert not offenders, f"unpartitioned Window in: {offenders}"


def test_stamp_filename_plan_is_join_free(spark, sf_dir):
    """The r6 rewrite of stamp_binlog_filename (cdc/positions.py) folds the
    rotate boundaries into plan literals and resolves each event with an
    unrolled binary search — no join, no shuffle. Its old BNLJ allowlist
    entry masked exactly the regression this pins: reintroducing ANY join
    (the 254.6 s 1-row crossJoin pathology) now fails at analysis time."""
    plan = REGISTRY["cdc_stamp_filename"].fn(
        spark, sf_dir
    )._jdf.queryExecution().optimizedPlan()
    joins = [
        node.getClass().getSimpleName()
        for node in _walk_plans(plan)
        if "Join" in node.getClass().getSimpleName()
    ]
    assert not joins, f"cdc_stamp_filename plan grew a join: {joins}"


def test_no_unplanned_cartesian_or_nested_loop_joins(spark, sf_dir):
    cart, bnlj = [], []
    for name, q in REGISTRY.items():
        plan = explain_str(q.fn(spark, sf_dir), "simple")
        if "CartesianProduct" in plan:
            cart.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            bnlj.append(name)
    assert not cart, f"CartesianProduct in: {cart}"
    assert not bnlj, f"unallowlisted BroadcastNestedLoopJoin in: {bnlj}"
