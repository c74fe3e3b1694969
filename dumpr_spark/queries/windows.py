"""Window-function surface (SURVEY §2.2 E).

The engine's core CDC materializer is itself a per-key top-1 (window/max_by)
— these queries declare the full analytic-window surface. All orderings carry
a unique tie-break key so results are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from dumpr_spark.queries.base import eps_round, query, t


@query(
    "win_topk_per_group",
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey
    ) WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
    tags=("window", "flagship"),
)
def win_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer — the row_number()<=k pattern (also the CDC
    dedup-latest shape, SURVEY §2.2-E)."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .orderBy("c_custkey", "rn")
    )


@query(
    "win_rank_dense",
    """
    SELECT p_brand, p_partkey, p_retailprice,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
    FROM part
    ORDER BY p_brand, p_retailprice DESC, p_partkey
    """,
    tags=("window",),
)
def win_rank_dense(spark, sf_dir):
    # r17 one-exchange shape: range on the window key serves the window's
    # clustering AND the trailing orderBy prefix (see win_running_sum).
    p = t(spark, sf_dir, "part").repartitionByRange("p_brand")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        p.select(
            "p_brand", "p_partkey", "p_retailprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .orderBy("p_brand", F.desc("p_retailprice"), "p_partkey")
    )


@query(
    "win_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey) OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate), o_orderkey)
    ORDER BY o_custkey, epoch_ms(o_orderdate), o_orderkey
    """,
    tags=("window",),
)
def win_lag_lead(spark, sf_dir):
    # r17 one-exchange shape: range on the window key serves the window's
    # clustering AND the trailing orderBy prefix (see win_running_sum).
    o = t(spark, sf_dir, "orders").repartitionByRange("o_custkey")
    ts = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    w = Window.partitionBy("o_custkey").orderBy(ts, F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey", "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "win_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate), o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def win_running_sum(spark, sf_dir):
    # r17 one-exchange shape: range-partition on the window key UP FRONT.
    # RangePartitioning([o_custkey]) satisfies the Window's
    # ClusteredDistribution AND prefix-satisfies the trailing global
    # orderBy's OrderedDistribution([o_custkey, o_orderkey]) (equal keys
    # land in one partition; partitions are in key order), so the plan is
    # ONE exchange + local sorts instead of hash-exchange + window +
    # range-exchange over the full window output. The price is the range
    # partitioner's sampling pass over the (column-pruned) scan — a read,
    # which is cheaper than the full-output shuffle it replaces.
    o = t(spark, sf_dir, "orders")
    ts = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(ts, F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.repartitionByRange("o_custkey")
        .select(
            "o_custkey", "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "win_first_last",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey) OVER w AS last_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "cdc-analog"),
)
def win_first_last(spark, sf_dir):
    """first/last over full frame — the binlog-filename-carry shape (R5)."""
    # r17 one-exchange shape: range on the window key serves the window's
    # clustering AND the trailing orderBy prefix (see win_running_sum).
    o = t(spark, sf_dir, "orders").repartitionByRange("o_custkey")
    ts = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(ts, F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey", "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_ok"),
            F.last("o_orderkey").over(w).alias("last_ok"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "win_ntile",
    """
    SELECT c_custkey, NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("window",),
)
def win_ntile(spark, sf_dir):
    """Two-phase distributed NTILE — the scale-safe form of a global-order
    window, via operators.ntile.global_ntile (full rationale + cost model
    there; property-tested against the single-window form in
    tests/test_windows_props.py)."""
    from dumpr_spark.operators.ntile import global_ntile

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return (
        global_ntile(c, 4, "c_acctbal", "c_custkey", out_col="quartile")
        .select("c_custkey", "quartile")
        .orderBy("c_custkey")
    )


@query(
    "win_pct_rank",
    """
    SELECT c_mktsegment, c_custkey,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_mktsegment, c_custkey
    """,
    tags=("window",),
)
def win_pct_rank(spark, sf_dir):
    """percent_rank/cume_dist per segment. No rounding needed: both engines
    compute the same exact rational in IEEE double ((rank-1)/(n-1), k/n)."""
    # r17 one-exchange shape: range on the window key serves the window's
    # clustering AND the trailing orderBy prefix (see win_running_sum).
    c = t(spark, sf_dir, "customer").repartitionByRange("c_mktsegment")
    w = Window.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_mktsegment", "c_custkey",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


@query(
    "win_range_frame",
    """
    SELECT p_brand, p_partkey, p_size,
           CAST(COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS similar_sized
    FROM part
    ORDER BY p_brand, p_partkey
    """,
    tags=("window",),
)
def win_range_frame(spark, sf_dir):
    """RANGE frame (value-based) — peers within +/-5 size units."""
    # r17 one-exchange shape: range on the window key serves the window's
    # clustering AND the trailing orderBy prefix (see win_running_sum).
    p = t(spark, sf_dir, "part").repartitionByRange("p_brand")
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-5, 5)
    return (
        p.select("p_brand", "p_partkey", "p_size", F.count(F.lit(1)).over(w).alias("similar_sized"))
        .orderBy("p_brand", "p_partkey")
    )


@query(
    "join_asof",
    """
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ms
      FROM events
    )
    SELECT user_id, event_id, last_click_ms
    FROM tagged WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """,
    tags=("window", "join"),
)
def join_asof(spark, sf_dir):
    """As-of join (latest click at-or-before each purchase, per user) in its
    window formulation — linear, no native as-of needed (SURVEY §2.2-C).
    Declared as running MAX of the tagged timestamp so the DuckDB oracle is the
    same formulation."""
    # r17 one-exchange shape (same reasoning as win_running_sum): range on
    # user_id serves both the window's clustering and the trailing
    # orderBy("user_id", "event_id") prefix, removing the second exchange.
    e = t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(ms, F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = e.repartitionByRange("user_id").select(
        "user_id", "event_id", "event_type",
        F.max(F.when(F.col("event_type") == "click", ms)).over(w).alias("last_click_ms"),
    )
    return (
        tagged.where(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "last_click_ms")
        .orderBy("user_id", "event_id")
    )


@query(
    "join_asof_union",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts AS vts, value AS view_value FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id, v.view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.vts <= p.ts
    ORDER BY p.event_id
    """,
    tags=("join", "asof", "scale"),
)
def join_asof_union(spark, sf_dir):
    """The one-shuffle union/carry-forward as-of join operator
    (operators/asof.py) checked against DuckDB's NATIVE ASOF JOIN: each
    purchase gets the value of the user's latest prior view (NULL when none).
    Unlike the window formulation (join_asof), this shape never builds the
    (left x right-per-key) intermediate — big-big safe."""
    from dumpr_spark.operators.asof import asof_join

    e = t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("value").alias("view_value")
    )
    out = asof_join(purchases, views, "user_id", "ts", "vts", right_cols=["view_value"])
    return out.select("event_id", "user_id", "view_value").orderBy("event_id")


@query(
    "win_nth_value",
    """
    SELECT c_mktsegment, c_custkey,
           NTH_VALUE(c_custkey, 2) OVER w AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY c_mktsegment, c_custkey
    """,
    tags=("window",),
)
def win_nth_value(spark, sf_dir):
    """nth_value over a running frame (the k-th element carry)."""
    # r17 one-exchange shape: range on the window key serves the window's
    # clustering AND the trailing orderBy prefix (see win_running_sum).
    c = t(spark, sf_dir, "customer").repartitionByRange("c_mktsegment")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        c.select(
            "c_mktsegment", "c_custkey",
            F.nth_value("c_custkey", 2).over(w).alias("second_richest"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


@query(
    "win_cume_dist",
    """
    SELECT c_mktsegment, c_custkey,
           ROUND(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
                 + 1e-9, 6) AS cd
    FROM customer
    WHERE c_custkey % 50 = 0
    ORDER BY c_mktsegment, c_custkey
    """,
    tags=("window",),
)
def win_cume_dist(spark, sf_dir):
    """cume_dist: fraction of partition rows at-or-below the current order
    key — the distribution-position stat pct_rank approximates differently
    (pct_rank is (rank-1)/(n-1); cume_dist is rank_with_ties/n). Keyed
    window partitioned by segment; ties (equal balances) share a value on
    both engines by definition."""
    from pyspark.sql import Window

    # r17 one-exchange shape: range on the window key serves the window's
    # clustering AND the trailing orderBy prefix (see win_running_sum).
    c = t(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 50 == 0
    ).repartitionByRange("c_mktsegment")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return (
        c.select(
            "c_mktsegment", "c_custkey",
            eps_round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


@query(
    "win_time_range_frame",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                                  RANGE BETWEEN 21600000 PRECEDING AND CURRENT ROW)
                 + 1e-9, 2) AS rolling_6h_sum,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                               RANGE BETWEEN 21600000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS rolling_6h_n
    FROM events ORDER BY event_id
    """,
    tags=("window", "timeseries"),
)
def win_time_range_frame(spark, sf_dir):
    """Time-based RANGE frame: per-user rolling 6-hour sum/count over EVENT
    TIME (not row count) — the frame every rate-limit / rolling-exposure
    metric needs, where a burst of events in one minute all share the same
    lookback window. Ordered by epoch millis so the frame arithmetic is
    integer on both engines; ties (same ms) are peers and aggregate
    identically by the RANGE-frame definition.

    Scale shape: window partitioned per user (millions of independent
    keys), frame evaluation is the engines' sliding-frame aggregation —
    O(rows) amortized per partition, no self-join expansion of the
    6-hour neighborhood."""
    e = t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(ms)
        .rangeBetween(-21600000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        eps_round(F.sum("value").over(w), 2).alias("rolling_6h_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("rolling_6h_n"),
    ).orderBy("event_id")


@query(
    "join_asof_tolerance",
    """
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) OVER (
               PARTITION BY user_id
               ORDER BY epoch_ms(ts),
                        CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                        event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ms
      FROM events
    )
    SELECT user_id, event_id,
           CASE WHEN last_click_ms >= epoch_ms(ts) - 3600000
                THEN last_click_ms END AS click_ms_within_1h
    FROM tagged WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """,
    tags=("window", "join", "timeseries"),
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join WITH TOLERANCE: each purchase matched to the latest click
    at-or-before it, but only if that click is within 1 hour — the staleness
    bound every trade-vs-quote / action-vs-context join needs (an hours-old
    context row is noise, not signal). Runs the canonical
    `operators/asof.asof_join(tolerance=...)` union-carry form: ONE shuffle
    on the key, last_value carry-forward, tolerance as a post-carry null-out
    — never a range join.

    Both sides compare at MILLISECOND precision: the events fixture carries
    microsecond timestamps, so the operator's full-precision <= and the
    oracle's epoch_ms arithmetic would disagree exactly at the tolerance
    boundary (a click 1h + 300us old is in by the ms clock, out by the us
    clock) and on same-ms click/purchase ties — the Spark inputs are
    therefore ms-truncated before the join, and the oracle orders clicks
    BEFORE the purchase within an equal ms, matching asof_join's
    right-sorts-first discipline at equal timestamps.

    Scale shape: identical to join_asof (key-partitioned window over the
    tagged union), the tolerance adds a projection only."""
    from dumpr_spark.operators.asof import asof_join

    e = t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.timestamp_millis(ms).alias("pts")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", ms.alias("click_ms"), F.timestamp_millis(ms).alias("click_ts")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_time="pts", right_time="click_ts",
        right_cols=["click_ms"], tolerance="1 HOUR",
    )
    return joined.select(
        "user_id", "event_id", F.col("click_ms").alias("click_ms_within_1h")
    ).orderBy("user_id", "event_id")


@query(
    "join_asof_nearest",
    """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, event_id AS view_id, ts AS vts, value AS view_value
      FROM events WHERE event_type = 'view'
    ),
    ranked AS (
      SELECT p.event_id, p.user_id, v.view_id, v.view_value,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY ABS(epoch_us(v.vts) - epoch_us(p.ts)),
                        CASE WHEN v.vts <= p.ts THEN 0 ELSE 1 END,
                        v.view_id DESC
             ) AS rn
      FROM p LEFT JOIN v ON p.user_id = v.user_id
    )
    SELECT event_id, user_id, view_id, view_value
    FROM ranked WHERE rn = 1 ORDER BY event_id
    """,
    tags=("join", "asof", "scale"),
)
def join_asof_nearest(spark, sf_dir):
    """direction='nearest' as-of join (operators/asof.asof_join_nearest):
    each purchase gets the user's CLOSEST view by |time delta| — before
    or after — completing the as-of family (backward: join_asof /
    join_asof_union; backward-with-staleness: join_asof_tolerance). The
    attribution shape backward-only gets wrong: a view logged seconds
    AFTER the purchase event (clock skew, batched client flush) is the
    right match, and backward silently picks a stale one or NULL.

    |dt| ties prefer the backward candidate (pandas merge_asof
    'nearest' semantics); equal-timestamp view ties break by max
    view_id — both rules deterministic, so the oracle (a per-purchase
    argmin over the key-joined pairs) reproduces the pick exactly.

    Scale shape: the operator is the union/two-carry form — ONE shuffle
    on user_id, backward and forward carries as two window passes inside
    the same exchange, then a row-local argmin; never the (purchases x
    views-per-user) intermediate the oracle builds (fixture-sized there
    by construction)."""
    from dumpr_spark.operators.asof import asof_join_nearest

    e = t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
        F.col("ts").alias("vts"),
    )
    out = asof_join_nearest(
        purchases, views, on="user_id", left_time="ts", right_time="vts",
        right_cols=["view_id", "view_value"],
    )
    return out.select("event_id", "user_id", "view_id", "view_value") \
        .orderBy("event_id")
