"""Batch-mode declarations of the streaming-window operators (SURVEY §2.2-H).

Spark's window/session_window functions are semantics-identical in batch and
Structured Streaming; declaring them here puts them under the DuckDB oracle,
while tests/test_streaming.py runs the same shapes through readStream +
watermark + memory sink. DuckDB formulations use explicit epoch arithmetic
(Spark's tumbling windows are epoch-aligned).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from dumpr_spark.queries.base import eps_round, query, t

_MS_5MIN = 5 * 60 * 1000
_MS_30MIN = 30 * 60 * 1000
_MS_4H = 4 * 60 * 60 * 1000


@query(
    "stream_tumbling_window",
    f"""
    SELECT epoch_ms(epoch_ms(ts) // {_MS_5MIN} * {_MS_5MIN}) AS w_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY w_start, event_type
    ORDER BY w_start, event_type
    """,
    tags=("streaming", "window", "flagship"),
)
def stream_tumbling_window(spark, sf_dir):
    """5-minute tumbling window aggregation (epoch-aligned, same as streaming)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total")
        .orderBy("w_start", "event_type")
    )


@query(
    "stream_sliding_window",
    f"""
    WITH expanded AS (
      SELECT epoch_ms(epoch_ms(ts) // {_MS_5MIN} * {_MS_5MIN} - o.off * {_MS_5MIN}) AS w_start, value
      FROM events
      CROSS JOIN (VALUES (0), (1)) AS o(off)
    )
    SELECT w_start, CAST(COUNT(*) AS BIGINT) AS n, ROUND(AVG(value) + 1e-9, 4) AS avg_value
    FROM expanded GROUP BY w_start ORDER BY w_start
    """,
    tags=("streaming", "window"),
)
def stream_sliding_window(spark, sf_dir):
    """10-minute window sliding every 5 minutes: each event lands in exactly
    two windows (the oracle expands via the 2-offset cross join)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), eps_round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("w_start"), "n", "avg_value")
        .orderBy("w_start")
    )


@query(
    "stream_session_window",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, epoch_ms(ts) AS ms,
             LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, ms,
             CASE WHEN prev_ms IS NULL OR ms - prev_ms >= {_MS_30MIN} THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ms
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS sess_start, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sess_id
    ORDER BY user_id, sess_start
    """,
    tags=("streaming", "window"),
)
def stream_session_window(spark, sf_dir):
    """Gap-based session windows (30-min gap) per user — the tx-sessionization
    analog (R4 is marker-based sessionization; this is its gap-based twin).
    Spark session_window merges events whose gap < 30min; the oracle is the
    lag/cumsum formulation of the same rule."""
    # r17: when the scan under-parallelizes (compact local file), range-
    # partition on user_id up front — it satisfies the session aggregation's
    # clustering AND the trailing orderBy("user_id", "sess_start") prefix,
    # so the plan needs ONE exchange instead of two. CONDITIONAL via
    # fan_out: on a wide cluster-scale scan the original shape is kept —
    # there the map-side partial session aggregate (events arrive time-
    # clustered, so same-user runs pre-merge) cuts shuffle bytes, which the
    # range form would give up by shuffling raw events.
    from dumpr_spark.operators.scale import fan_out

    e = fan_out(t(spark, sf_dir, "events"), "user_id", by_range=True)
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("sess_start"), "n_events")
        .orderBy("user_id", "sess_start")
    )


@query(
    "stream_dedup_first",
    """
    SELECT user_id, event_type, event_id AS first_event
    FROM (
      SELECT user_id, event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_ms(ts), event_id) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    tags=("streaming",),
)
def stream_dedup_first(spark, sf_dir):
    """Keyed dedup keeping the earliest event — the deterministic batch twin
    of streaming dropDuplicates(["user_id","event_type"]) + watermark."""
    # r17 one-exchange shape: range on the window key serves the window's
    # clustering AND the trailing orderBy prefix (see win_running_sum).
    # r18: CONDITIONAL via fan_out, like stream_session_window — this query
    # is REDUCTIVE (rn=1 keeps one row per key), so at cluster scale the
    # hash+range shape is better: the trailing range exchange moves only
    # deduped rows and the scan is evaluated once, where an unconditional
    # upfront range would shuffle raw events AND pay the range-sampling
    # pass a second evaluation of the full scan. (The r17 window-family
    # batch keeps its UNconditional range: those queries emit one row per
    # input row, so there the saved exchange is full-size at any scale.)
    from dumpr_spark.operators.scale import fan_out

    e = fan_out(t(spark, sf_dir, "events"), "user_id", "event_type", by_range=True)
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id", "event_type").orderBy(ms, F.asc("event_id"))
    return (
        e.select("user_id", "event_type", "event_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event"))
        .orderBy("user_id", "event_type")
    )


@query(
    "events_funnel",
    """
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN first_view IS NOT NULL AND first_click > first_view
                     AND first_purchase > first_click THEN 3
                WHEN first_view IS NOT NULL AND first_click > first_view THEN 2
                WHEN first_view IS NOT NULL THEN 1
                ELSE 0 END AS funnel_stage
    FROM stages ORDER BY user_id
    """,
    tags=("streaming", "events"),
)
def events_funnel(spark, sf_dir):
    """Funnel analysis over the event stream: deepest strictly-ordered
    view -> click -> purchase stage per user. One conditional-min aggregation
    (single shuffle on user_id, partial combine) — the 100 TB funnel shape;
    in streaming the same aggregate runs under a watermark."""
    e = t(spark, sf_dir, "events")
    first = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))  # noqa: E731
    stages = e.groupBy("user_id").agg(
        first("view").alias("first_view"),
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    full = (
        F.col("first_view").isNotNull()
        & (F.col("first_click") > F.col("first_view"))
        & (F.col("first_purchase") > F.col("first_click"))
    )
    two = F.col("first_view").isNotNull() & (F.col("first_click") > F.col("first_view"))
    return stages.select(
        "user_id",
        F.when(full, 3).when(two, 2).when(F.col("first_view").isNotNull(), 1)
        .otherwise(0).alias("funnel_stage"),
    ).orderBy("user_id")


@query(
    "events_sessionize",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR floor(date_part('epoch', ts)) - floor(date_part('epoch', lag(ts) OVER w)) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      -- SUM(BIGINT) widens to HUGEINT in DuckDB, which the comparison
      -- harness canonicalizes to float64; CAST back so it stays int64
      -- like Spark's running sum.
      SELECT user_id, ts,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      FROM marked
    )
    SELECT user_id, session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS s_start, MAX(ts) AS s_end,
           CAST(floor(date_part('epoch', MAX(ts))) - floor(date_part('epoch', MIN(ts)))
                AS BIGINT) AS dur_sec
    FROM sess GROUP BY user_id, session_idx ORDER BY user_id, session_idx
    """,
    tags=("streaming", "session", "batch"),
)
def events_sessionize(spark, sf_dir):
    """Gap-based batch sessionization, the lag -> boundary-flag -> running-sum
    classic: a 30-min silence starts a new session per user. Every window is
    partitioned by user_id (no global order anywhere), so the whole op is one
    shuffle on the session key; equal-timestamp ties are assignment-invariant
    (gap 0 regardless of tie order), which is what makes the cross-engine
    comparison exact. Complements `stream_session_window`
    (session_window/gap semantics under streaming watermarks) with the form
    that also yields session ORDINALS."""
    # r17 one-exchange shape: range on user_id serves BOTH lag/cumsum
    # windows, the (user_id, session_idx) rollup (subset clustering), and
    # the trailing orderBy prefix — 3 exchanges collapse to 1.
    # r18: CONDITIONAL via fan_out (same reasoning as stream_dedup_first):
    # the session rollup REDUCES, so at cluster scale hash(user_id) serving
    # windows+rollup plus a small range exchange of the rollup output beats
    # an upfront range that shuffles raw events and samples the full scan.
    from dumpr_spark.operators.scale import fan_out

    e = fan_out(t(spark, sf_dir, "events"), "user_id", by_range=True)
    w = Window.partitionBy("user_id").orderBy("ts")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_sec = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = e.select(
        "user_id", "ts",
        F.when(gap_sec.isNull() | (gap_sec > 30 * 60), 1).otherwise(0).alias("new_s"),
    )
    sess = marked.withColumn("session_idx", F.sum("new_s").over(run))
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .cast("long").alias("dur_sec"),
        )
        .orderBy("user_id", "session_idx")
    )


@query(
    "events_ewma",
    """
    WITH RECURSIVE base AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    rec AS (
      SELECT user_id, event_id, value, rn, value AS ewma FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.event_id, b.value, b.rn, 0.3 * b.value + 0.7 * r.ewma
      FROM rec r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1
    )
    SELECT user_id, event_id, ROUND(ewma + 1e-9, 6) AS ewma
    FROM rec ORDER BY user_id, event_id
    """,
    tags=("streaming", "stateful", "batch"),
)
def events_ewma(spark, sf_dir):
    """Batch EWMA per user (the batch twin of streaming/state.ewma_anomalies):
    a running exponential average is inherently sequential per key, so the
    Spark form is a per-key Arrow `applyInPandas` fold (one shuffle on
    user_id, python only inside each group's Arrow batch) — the same
    stratified-sequential shape as `pack_sequences` — while the oracle walks
    identical order with a recursive CTE. The closed-form window formulation
    is rejected on purpose: (1-a)^(-rn) overflows/obliterates precision past
    a few thousand rows per key. The in-group fold is pandas
    `ewm(alpha, adjust=False)` — the identical y_t = a*x_t + (1-a)*y_{t-1}
    recurrence run in C instead of a per-row Python loop (r7 census swap;
    equality pinned by the unchanged recursive-CTE oracle).

    Precondition: non-null `value`. pandas `ewm` SKIPS NaN and continues
    the recurrence (the removed Python loop would have propagated NaN into
    every later y_t), so a null would silently change semantics rather
    than error. The events schema guarantees value NOT NULL (TESTDATA.md;
    asserted here so a future nullable feed fails loudly instead of
    drifting).

    r18 (§2/§4): conditional fan_out on user_id before the groupBy — the
    Python fold's cost is per GROUP, which AQE's byte-based partition
    coalescing cannot see, so on a compact local scan it shrank the
    exchange to ~2 partitions and serialized ~750 pandas calls onto two
    tasks. The REPARTITION_BY_NUM exchange is reused by the groupBy
    (ClusteredDistribution(user_id)) and is not coalesced; at cluster
    scale fan_out no-ops and the groupBy's own exchange stays byte-sized.
    Interleaved A/B at sf0.1: 8.71 -> 2.82 s min-of-3, rows identical."""
    import pandas as pd

    from dumpr_spark.operators.scale import fan_out

    e = fan_out(
        t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value"),
        "user_id",
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["value"].isna().any():
            raise ValueError(
                "events_ewma requires non-null value: pandas ewm would "
                "skip the NaN and keep folding, silently diverging from "
                "the NaN-propagating recurrence"
            )
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        pdf = pdf.assign(
            ewma=pdf["value"].astype("float64")
            .ewm(alpha=0.3, adjust=False).mean()
        )
        return pdf[["user_id", "event_id", "ewma"]]

    folded = e.groupBy("user_id").applyInPandas(
        fold, "user_id long, event_id long, ewma double"
    )
    return folded.select(
        "user_id", "event_id", eps_round(F.col("ewma"), 6).alias("ewma")
    ).orderBy("user_id", "event_id")


@query(
    "stream_heavy_hitters",
    f"""
    SELECT epoch_ms(epoch_ms(ts) // {_MS_4H} * {_MS_4H}) AS w_start,
           user_id,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY w_start, user_id
    HAVING COUNT(*) >= 3
    ORDER BY w_start, user_id
    """,
    tags=("streaming", "window", "heavy-hitters"),
)
def stream_heavy_hitters(spark, sf_dir):
    """Per-window heavy hitters: users with >= 3 events in a 4-hour
    tumbling window — the rate-anomaly / hot-key detector of an event
    pipeline, exact form.

    Exact-by-count is the right scale call while the key space (users) is
    bounded: the groupBy partially aggregates map-side, so the shuffle
    carries one (window, user, partial-count) row per input partition, and
    the HAVING prunes before any sort. A count-min-sketch variant only wins
    when keys are unbounded (then it is engine-specific => rows-only, like
    dedup_simhash); this one stays under the value-level oracle. In
    streaming the same plan runs windowed-stateful with a watermark
    (tests/test_streaming.py drives the shape)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "4 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 3)
        .select(F.col("w.start").alias("w_start"), "user_id", "n")
        .orderBy("w_start", "user_id")
    )


def staged_funnel(e):
    """The staged min-reduction funnel over an events projection
    (user_id, event_type, ts) — shared by the `events_funnel_strict` query
    and the re-engagement unit test so the test exercises the REAL builder,
    not a private copy."""
    a = e.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("ta"))
    b = (
        e.where(F.col("event_type") == "click")
        .join(a, "user_id")
        .where(F.col("ts") > F.col("ta"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tb"))
    )
    c = (
        e.where(F.col("event_type") == "purchase")
        .join(b, "user_id")
        .where(F.col("ts") > F.col("tb"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    return (
        a.join(b, "user_id", "left")
        .join(c, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("tb").isNotNull().cast("int")
                + F.col("tc").isNotNull().cast("int")
            )
            .cast("int")
            .alias("stage"),
            F.col("tb").alias("first_qual_click"),
        )
        .orderBy("user_id")
    )


@query(
    "events_funnel_strict",
    """
    WITH a AS (
      SELECT user_id, MIN(ts) AS ta FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    b AS (
      SELECT e.user_id, MIN(e.ts) AS tb
      FROM events e JOIN a ON e.user_id = a.user_id
      WHERE e.event_type = 'click' AND e.ts > a.ta GROUP BY e.user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS tc
      FROM events e JOIN b ON e.user_id = b.user_id
      WHERE e.event_type = 'purchase' AND e.ts > b.tb GROUP BY e.user_id
    )
    SELECT a.user_id,
           CAST(1 + (CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END) AS INT) AS stage,
           b.tb AS first_qual_click
    FROM a LEFT JOIN b ON a.user_id = b.user_id
           LEFT JOIN c ON a.user_id = c.user_id
    ORDER BY a.user_id
    """,
    tags=("streaming", "funnel"),
)
def events_funnel_strict(spark, sf_dir):
    """Strict sequenced funnel (view -> click -> purchase): a user reaches
    stage 2 only with a click strictly AFTER their first view, stage 3 only
    with a purchase strictly after that first QUALIFYING click. This is the
    re-engagement-correct form `events_funnel`'s single-pass conditional-min
    approximates: there, a user with click@1 view@2 click@3 purchase@4 stalls
    at stage 1 (global first_click precedes the view); here the click@3
    qualifies and the user converts fully.

    Staged min-reduction instead of per-user event sorting: each stage is a
    groupBy(user).min(ts) gated by the previous stage's timestamp. All three
    aggregations and both left joins hash on user_id, so AQE co-partitions
    one narrow (user, ts) tuple stream per stage — no per-user collect_list,
    no global sort, and the event payload columns never leave the scan. The
    final rollup is three rows."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return staged_funnel(e)


@query(
    "events_markov_transitions",
    """
    WITH seqd AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seqd WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           ROUND(n::DOUBLE / SUM(n) OVER (PARTITION BY prev_type) + 1e-9, 6) AS p
    FROM pairs ORDER BY prev_type, next_type
    """,
    tags=("streaming", "sessions", "markov"),
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences —
    the behavioral-model statistic behind next-action prediction and bot
    detection (uniform transition rows are a bot tell).

    lag() over (user, ts) is a keyed window: ~|users| independent partitions,
    one shuffle, no global order (event_id tie-breaks equal timestamps so
    both engines see the same successor). The pair rollup map-side-combines
    to at most |types|^2 rows, and the probability normalization runs over
    that tiny aggregate, not the event stream."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select("event_type", F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        eps_round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    ).orderBy("prev_type", "next_type")


@query(
    "events_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, MIN(epoch_ms(ts) // 86400000 // 7) AS cohort_wk
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 // 7 AS active_wk
      FROM events
    )
    SELECT CAST(f.cohort_wk AS BIGINT) AS cohort_wk,
           CAST(a.active_wk - f.cohort_wk AS BIGINT) AS wk_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY cohort_wk, wk_offset
    ORDER BY cohort_wk, wk_offset
    """,
    tags=("streaming", "events", "retention"),
)
def events_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen week, counted in
    each later week they were active — THE growth-analytics rollup over an
    event stream (epoch-aligned weeks, same arithmetic both engines). Two
    aggregations + one equi-join, all hashed on user_id, so the wide event
    scan reduces to (user, week) pairs before anything joins; the matrix
    itself is |cohorts x offsets| — tiny at any scale."""
    e = t(spark, sf_dir, "events")
    wk = (F.unix_millis(F.col("ts").cast("timestamp")) / 86400000 / 7).cast("long")
    firsts = e.groupBy("user_id").agg(F.min(wk).alias("cohort_wk"))
    activity = e.select("user_id", wk.alias("active_wk")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_wk").cast("long").alias("cohort_wk"),
            (F.col("active_wk") - F.col("cohort_wk")).cast("long").alias("wk_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_wk", "wk_offset")
    )


@query(
    "rollup_ohlc",
    """
    WITH ranked AS (
      SELECT date_trunc('hour', ts) AS h, event_type, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT h, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           ROUND(MAX(value), 2) AS high,
           ROUND(MIN(value), 2) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           ROUND(SUM(value) + 1e-9, 2) AS volume
    FROM ranked GROUP BY h, event_type ORDER BY h, event_type
    """,
    tags=("streaming", "timeseries", "ohlc"),
)
def rollup_ohlc(spark, sf_dir):
    """OHLC candlestick rollup (the metrics/market-data hypertable op): one
    hash aggregation per (hour, event_type) bar where open/close are
    `min_by`/`max_by` on the total (ts, event_id) order — single-pass,
    partial-combining, no window over the raw stream (the oracle's
    row_number formulation is the same semantics spelled out in ANSI SQL).
    At 100 TB each partition contributes ONE candidate row per bar on the
    shuffle wire; contrast with the naive first()/last()-over-window form,
    which shuffles every tick. Streaming twin: the same min_by/max_by
    aggregate runs under a tumbling `window()` with a watermark."""
    e = t(spark, sf_dir, "events")
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), F.col("event_type")
        )
        .agg(
            F.min_by("value", order).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.max_by("value", order).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            eps_round(F.sum("value"), 2).alias("volume"),
        )
        .orderBy("h", "event_type")
    )


@query(
    "events_anomaly_mad",
    """
    WITH med AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.5) + 1e-9, 4) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, MIN(m.med) AS med,
             ROUND(quantile_cont(abs(e.value - m.med), 0.5) + 1e-9, 4) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT a.event_type, a.med, a.mad,
           CAST(COUNT(*) FILTER (WHERE abs(e.value - a.med)
                                       > 3 * 1.4826 * a.mad) AS BIGINT)
             AS n_anomalies,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM events e JOIN mad a USING (event_type)
    GROUP BY a.event_type, a.med, a.mad
    ORDER BY a.event_type
    """,
    tags=("streaming", "anomaly", "robust"),
)
def events_anomaly_mad(spark, sf_dir):
    """Robust anomaly detection: median absolute deviation (MAD) per
    event_type, flagging values beyond 3 scaled MADs (1.4826 ~ consistency
    constant for a normal distribution). Median and MAD are rounded to 4dp
    BEFORE the threshold comparison so the flag predicate is bit-identical
    across engines. Two exact-percentile passes plus a broadcast join of
    the 5-row stats table back onto the stream — at 100 TB the exact
    median would switch to the mergeable histogram sketch
    (agg_quantile_mergeable), keeping the same two-pass shape with a
    sketch-sized shuffle instead of a sort."""
    e = t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        eps_round(F.percentile("value", F.lit(0.5)), 4).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.min("med").alias("med"),
        eps_round(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 4
        ).alias("mad"),
    )
    flagged = e.join(F.broadcast(mad), "event_type")
    is_anom = F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")
    return (
        flagged.groupBy("event_type", "med", "mad")
        .agg(
            F.sum(F.when(is_anom, 1).otherwise(0)).alias("n_anomalies"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("event_type")
    )


@query(
    "events_changepoint_cusum",
    """
    WITH stats AS (
      SELECT event_type, ROUND(AVG(value) + 1e-9, 6) AS mu
      FROM events GROUP BY event_type
    ),
    walked AS (
      SELECT e.event_type, e.ts, e.event_id,
             ROUND(SUM(e.value - s.mu) OVER (
               PARTITION BY e.event_type ORDER BY e.ts, e.event_id
             ) + 1e-9, 4) AS cusum
      FROM events e JOIN stats s USING (event_type)
    ),
    ranked AS (
      SELECT event_type, ts, event_id, cusum,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY abs(cusum) DESC, ts, event_id
             ) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM walked
    )
    SELECT event_type, ts AS cp_ts, event_id AS cp_event_id, cusum, n
    FROM ranked WHERE rn = 1 ORDER BY event_type
    """,
    tags=("streaming", "anomaly", "changepoint"),
)
def events_changepoint_cusum(spark, sf_dir):
    """CUSUM changepoint detection: per event_type, walk the series in
    (ts, event_id) order accumulating sum(value - mean); the position of
    max |cusum| is the classic estimate of where the level shifted. Both
    windows are PARTITIONED by event_type (no global order anywhere); the
    cusum is rounded to 4dp before the argmax ranking so the picked row is
    engine-stable even though windowed summation trees differ in the low
    bits (rounding granularity 1e-4 vs float noise ~1e-10), and the mean
    itself is eps-rounded before the walk so the accumulated ulp noise of
    a parallel avg cannot drift the cusum across a rounding edge
    (agg_pareto_abc's r7 flake class). At 100 TB the
    mean is a broadcast 5-row join and the cumulative window shuffles each
    type's rows once."""
    from pyspark.sql import Window

    # r17 one-exchange shape (stream side): range on event_type serves the
    # cusum walk, the argmax pick, and the count windows, plus the trailing
    # orderBy — the broadcast mu join preserves the stream partitioning.
    # mu aggregates from the BARE scan (its own map-side combine), not the
    # repartitioned stream, so the broadcast build pays no range exchange.
    e0 = t(spark, sf_dir, "events")
    e = e0.repartitionByRange("event_type")
    # mu is eps-rounded BEFORE the walk: the parallel avg's last ulp
    # varies with shuffle arrival order (run-to-run, not just
    # cross-engine), and the cusum accumulates that ulp n times — the
    # same boundary-flip class as the agg_pareto_abc r7 flake, hardened
    # proactively (a rounded mean changes the statistic immeasurably;
    # an unrounded one changes WHICH ROW is the argmax, rarely)
    mu = e0.groupBy("event_type").agg(eps_round(F.avg("value"), 6).alias("mu"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = e.join(F.broadcast(mu), "event_type").withColumn(
        "cusum", eps_round(F.sum(F.col("value") - F.col("mu")).over(w_cum), 4)
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("cusum"))), F.asc("ts"), F.asc("event_id")
    )
    w_n = Window.partitionBy("event_type")
    return (
        walked.withColumn("rn", F.row_number().over(w_pick))
        .withColumn("n", F.count(F.lit(1)).over(w_n))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("ts").alias("cp_ts"),
            F.col("event_id").alias("cp_event_id"),
            "cusum",
            "n",
        )
        .orderBy("event_type")
    )


@query(
    "agg_welch_ttest",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             COUNT(value) FILTER (WHERE event_type = 'click') AS n1,
             AVG(value) FILTER (WHERE event_type = 'click') AS m1,
             var_samp(value) FILTER (WHERE event_type = 'click') AS v1,
             COUNT(value) FILTER (WHERE event_type = 'view') AS n2,
             AVG(value) FILTER (WHERE event_type = 'view') AS m2,
             var_samp(value) FILTER (WHERE event_type = 'view') AS v2
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY day
    )
    SELECT day, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2) + 1e-9, 4) AS t_stat,
           ROUND(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1))
                 + 1e-9, 2) AS df
    FROM daily WHERE n1 >= 2 AND n2 >= 2
    ORDER BY day
    """,
    tags=("agg", "stats", "inference"),
)
def agg_welch_ttest(spark, sf_dir):
    """Welch's two-sample t-test per day ('click' vs 'view' values) — the
    A/B-testing primitive, spelled out from moments like agg_stats_moments
    (engines' t-test builtins don't exist / differ): t from the unpooled
    variances, degrees of freedom via Welch-Satterthwaite. One conditional
    aggregation computes BOTH groups' moments in a single pass (FILTER
    clauses / when()-guarded aggs — no self-join, no second scan), so at
    100 TB this is one partial-combining groupBy on day. Sample sizes count
    NON-NULL values (COUNT(value), F.count(when(cond, v))) — a NULL is not
    a measurement, and counting it would inflate n against the NULL-free
    mean/variance (the same oracle-blind class sketches.bin_index guards)."""
    e = t(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    is1 = F.col("event_type") == "click"
    is2 = F.col("event_type") == "view"
    v = F.col("value")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.when(is1, v)).alias("n1"),
        F.avg(F.when(is1, v)).alias("m1"),
        F.var_samp(F.when(is1, v)).alias("v1"),
        F.count(F.when(is2, v)).alias("n2"),
        F.avg(F.when(is2, v)).alias("m2"),
        F.var_samp(F.when(is2, v)).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    df_ws = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return (
        daily.where((F.col("n1") >= 2) & (F.col("n2") >= 2))
        .select(
            "day",
            "n1",
            "n2",
            eps_round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 4).alias("t_stat"),
            eps_round(df_ws, 2).alias("df"),
        )
        .orderBy("day")
    )


@query(
    "events_gapfill",
    """
    WITH ranked AS (
      SELECT user_id, date_trunc('hour', ts) AS h, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id < 10
    ),
    hr AS (
      SELECT user_id, h, MAX(CASE WHEN rn = 1 THEN value END) AS v
      FROM ranked GROUP BY user_id, h
    ),
    bounds AS (
      SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hr GROUP BY user_id
    ),
    spine AS (
      SELECT b.user_id, s.h
      FROM bounds b, UNNEST(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS s(h)
    ),
    joined AS (
      SELECT s.user_id, s.h, hr.v, hr.v IS NULL AS is_gap
      FROM spine s LEFT JOIN hr ON hr.user_id = s.user_id AND hr.h = s.h
    )
    SELECT user_id, h,
           ROUND(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1e-9, 4) AS value_filled,
           is_gap
    FROM joined ORDER BY user_id, h
    """,
    tags=("events", "timeseries"),
)
def events_gapfill(spark, sf_dir):
    """Time-series gap filling (the observability/sensor completeness op):
    build each entity's hourly spine between its first and last observation,
    left-join the observed per-hour values (max_by on the total (ts,
    event_id) order when an hour has several), and forward-fill gaps with
    last-observation-carried-forward. `is_gap` marks interpolated rows.

    Scale shape: the spine is a per-entity `sequence()` explode — generated
    data, narrow, sized by time range not event count; the join and the
    LOCF window are both keyed by entity (no global order anywhere), so a
    million entities parallelize across the cluster. The per-hour
    pre-aggregate combines map-side before the spine join."""
    e = t(spark, sf_dir, "events").where(F.col("user_id") < 10)
    hr = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("v"))
    bounds = hr.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = spine.join(hr, ["user_id", "h"], "left").select(
        "user_id", "h", "v", F.col("v").isNull().alias("is_gap")
    )

    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "h",
        eps_round(F.last("v", ignorenulls=True).over(w), 4).alias("value_filled"),
        "is_gap",
    ).orderBy("user_id", "h")


@query(
    "events_dwell_time",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT prev_type AS from_type, event_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG((epoch_ms(ts) - epoch_ms(prev_ts)) / 1000.0) + 1e-9, 2)
             AS avg_dwell_s,
           ROUND(MAX((epoch_ms(ts) - epoch_ms(prev_ts)) / 1000.0) + 1e-9, 2)
             AS max_dwell_s
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type ORDER BY from_type, to_type
    """,
    tags=("events", "timeseries"),
)
def events_dwell_time(spark, sf_dir):
    """Dwell-time analytics: seconds spent between consecutive events per
    (from_type -> to_type) transition — the TIME-weighted complement of the
    `events_markov_transitions` count matrix (where users go AND how long
    they linger before going there). One lag() window keyed per user on the
    total (ts, event_id) order, then a transition-pair rollup.

    Scale shape: the window partitions by user (millions of independent
    keys), the rollup's key space is |event_type|^2 (tiny) with map-side
    partial combine — the shuffle carries per-partition transition
    aggregates, not event rows."""

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("from_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    ).where(F.col("from_type").isNotNull())
    ms = lambda c: F.unix_millis(F.col(c).cast("timestamp"))  # noqa: E731
    dwell = (ms("ts") - ms("prev_ts")) / F.lit(1000.0)
    return (
        seq.groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            eps_round(F.avg(dwell), 2).alias("avg_dwell_s"),
            eps_round(F.max(dwell), 2).alias("max_dwell_s"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "events_autocorr",
    """
    WITH lagged AS (
      SELECT event_type, value,
             lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id)
               AS prev_value
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(prev_value) AS BIGINT) AS n_pairs,
           ROUND(corr(value, prev_value) + 1e-9, 4) AS autocorr_lag1
    FROM lagged WHERE prev_value IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("events", "timeseries", "stats"),
)
def events_autocorr(spark, sf_dir):
    """Lag-1 autocorrelation of the value series per event type — the
    serial-dependence diagnostic (is this metric a random walk, mean-
    reverting, or i.i.d. noise?) that decides whether the anomaly rules
    (MAD, CUSUM, EWMA) need detrending first.

    Scale shape: event_type is LOW-cardinality (a handful of values in any
    deployment), so a lag window partitioned only by it would be one
    single-task sort per series at 100 TB. Instead the lag pairs are built
    per (event_type, week-chunk): the window partitions by
    (event_type, chunk) — millions of bounded-size sort groups — and the
    one lag pair that CROSSES each chunk edge is recovered from a per-chunk
    (first, last) summary: a groupBy producing one row per (type, chunk)
    (tiny — |types| x |weeks|), a lag over that summary to find the last
    value of the previous non-empty chunk (gap-safe: chunk ids need not be
    contiguous), and a union of those boundary pairs with the intra-chunk
    pairs. corr's partials are the five power sums — constant-size,
    mergeable — so the final rollup shuffles per-partition sums only."""
    e = t(spark, sf_dir, "events")
    ev = e.select(
        "event_type",
        "value",
        "ts",
        "event_id",
        (F.floor(F.unix_timestamp("ts") / F.lit(604800))).alias("chunk"),
    )
    # Intra-chunk lag pairs: bounded sort groups, scales with chunk count.
    wc = Window.partitionBy("event_type", "chunk").orderBy("ts", "event_id")
    intra = ev.select(
        "event_type", "value", F.lag("value").over(wc).alias("prev_value")
    ).where(F.col("prev_value").isNotNull())
    # Per-chunk first/last value summary: one row per (type, chunk).
    order_key = F.struct("ts", "event_id")
    summary = ev.groupBy("event_type", "chunk").agg(
        F.min_by("value", order_key).alias("first_value"),
        F.max_by("value", order_key).alias("last_value"),
    )
    # Boundary pairs: first value of chunk k vs last value of the previous
    # non-empty chunk. The window runs over the tiny summary relation.
    ws = Window.partitionBy("event_type").orderBy("chunk")
    boundary = summary.select(
        "event_type",
        F.col("first_value").alias("value"),
        F.lag("last_value").over(ws).alias("prev_value"),
    ).where(F.col("prev_value").isNotNull())
    lagged = intra.unionByName(boundary)
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("prev_value").cast("long").alias("n_pairs"),
            eps_round(F.corr("value", "prev_value"), 4).alias("autocorr_lag1"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-5 additions (_R5_NEW): calendar analytics, streaks, paths, churn
# ---------------------------------------------------------------------------


@query(
    "events_streak_longest",
    """
    WITH days AS (
      SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
    ),
    islands AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, COUNT(*) AS len FROM islands GROUP BY user_id, grp
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id ORDER BY user_id
    """,
    tags=("events", "timeseries"),
)
def events_streak_longest(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands idiom (day minus per-user day-rank is constant within
    a consecutive run), the engagement metric behind every 'N-day streak'
    badge.

    Scale shape: the raw stream first distincts to (user, day) — at most
    365 rows per user per year regardless of event volume — and the
    row_number window partitions per user over that reduced set; map-side
    combine on the distinct, two tiny follow-up aggregates. Day ids are
    integer epoch-day arithmetic, identical on both engines."""
    e = t(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        (F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(86400000))).alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("grp")
    )
    streaks = islands.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_streak"),
            F.sum("len").cast("long").alias("n_active_days"),
        )
        .withColumn("user_id", F.col("user_id").cast("long"))
        .select("user_id", "longest_streak", "n_active_days")
        .orderBy("user_id")
    )


@query(
    "events_calendar_grid",
    """
    SELECT CAST((epoch_ms(ts) // 86400000 + 4) % 7 AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(AVG(value) + 1e-9, 2) AS avg_value
    FROM events GROUP BY dow, hod ORDER BY dow, hod
    """,
    tags=("events", "rollup"),
)
def events_calendar_grid(spark, sf_dir):
    """Calendar heatmap grid: event count and mean value per (day-of-week,
    hour-of-day) cell — the weekly-seasonality fingerprint (when is this
    system busy?). Day-of-week is computed as (epoch_day + 4) % 7
    (1970-01-01 was a Thursday; Sunday = 0) — pure integer arithmetic, so
    no dependence on either engine's dayofweek() start-of-week convention.

    Scale shape: single map-side-combining aggregate to a fixed 7x24 grid
    — partials are 168 cells regardless of input size; the shuffle carries
    one grid per partition."""
    e = t(spark, sf_dir, "events")
    day = F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(86400000))
    return (
        e.groupBy(
            ((day + 4) % 7).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            eps_round(F.avg("value"), 2).alias("avg_value"),
        )
        .orderBy("dow", "hod")
    )


@query(
    "events_top_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS n1,
             lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS n2
      FROM events
    ),
    paths AS (
      SELECT event_type || '>' || n1 || '>' || n2 AS path
      FROM seq WHERE n1 IS NOT NULL AND n2 IS NOT NULL
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM paths GROUP BY path
    ORDER BY n DESC, path LIMIT 10
    """,
    tags=("events", "funnel"),
)
def events_top_paths(spark, sf_dir):
    """Top 3-step behavioral paths: the most common (A -> B -> C) event
    sequences across all users — the path-mining view one level deeper
    than the events_markov_transitions pair matrix (a Markov chain cannot
    distinguish A->B->A from A->B->C journeys; 3-grams can).

    Scale shape: two lead() calls share ONE per-user window sort; the
    path space collapses to |event_type|^3 keys with map-side combine, and
    the top-10 is TakeOrdered over that tiny rollup — no global sort
    materializes."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("n1"),
        F.lead("event_type", 2).over(w).alias("n2"),
    ).where(F.col("n1").isNotNull() & F.col("n2").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "n1", "n2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@query(
    "events_inactive_users",
    """
    WITH horizon AS (SELECT MAX(ts) AS max_ts FROM events),
    per_user AS (
      SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT CAST(epoch_ms(first_ts) // 604800000 AS BIGINT) AS cohort_week,
           CASE WHEN epoch_ms(last_ts) < epoch_ms(max_ts) - 604800000
                THEN 'inactive' ELSE 'active' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS total_events
    FROM per_user, horizon
    GROUP BY cohort_week, status ORDER BY cohort_week, status
    """,
    tags=("events", "churn"),
)
def events_inactive_users(spark, sf_dir):
    """Inactivity/churn classification: users whose LAST event is more than
    7 days before the stream horizon (the corpus max timestamp) are
    'inactive', grouped by first-seen cohort week — the churn-rate-by-
    cohort table retention dashboards plot.

    Scale shape: one per-user min/max/count aggregate (map-side combine),
    then the 1-row horizon aggregate broadcast against the per-user rollup
    (the allowlisted scalar-broadcast BNLJ shape) and a tiny final
    grouping — the raw stream is scanned twice (per-user fold + horizon),
    never joined row-to-row."""
    e = t(spark, sf_dir, "events")
    ms = lambda c: F.unix_millis(F.col(c).cast("timestamp"))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    horizon = e.agg(F.max("ts").alias("max_ts"))
    week = F.floor(ms("first_ts") / F.lit(604800000)).cast("long")
    status = F.when(
        ms("last_ts") < ms("max_ts") - F.lit(604800000), "inactive"
    ).otherwise("active")
    return (
        per_user.crossJoin(F.broadcast(horizon))
        .groupBy(week.alias("cohort_week"), status.alias("status"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .orderBy("cohort_week", "status")
    )


@query(
    "events_ab_srm",
    """
    WITH assigned AS (
      SELECT DISTINCT user_id,
             ('0x' || substring(md5('srm:' || user_id), 1, 4))::BIGINT % 2 AS variant
      FROM events
    ),
    counts AS (
      SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::DOUBLE AS a,
             SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::DOUBLE AS b
      FROM assigned
    )
    SELECT CAST(a AS BIGINT) AS n_control, CAST(b AS BIGINT) AS n_treatment,
           ROUND((a - b) * (a - b) / (a + b) + 1e-9, 6) AS chi2_stat,
           (a - b) * (a - b) / (a + b) > 3.841 AS srm_detected
    FROM counts
    """,
    tags=("events", "stats", "experiment"),
)
def events_ab_srm(spark, sf_dir):
    """Sample-ratio-mismatch check for a 50/50 hash-bucketed experiment:
    assign each distinct user by seeded hash parity, then the 1-dof
    chi-square statistic against the expected even split ((a-b)^2/(a+b),
    the closed form of sum((obs-exp)^2/exp) for two equal cells) with the
    p<0.05 critical value 3.841 — the guardrail every experimentation
    system runs before trusting a result (an SRM means broken assignment,
    not a real effect).

    Scale shape: distinct users (hash shuffle of keys only) -> two
    conditional counts in ONE 1-row aggregate — the comparison is pure
    projection arithmetic on that row."""
    e = t(spark, sf_dir, "events")
    variant = (
        F.conv(F.substring(F.md5(F.concat(F.lit("srm:"), F.col("user_id").cast("string"))), 1, 4), 16, 10)
        .cast("long") % 2
    )
    counts = (
        e.select("user_id").distinct()
        .select(variant.alias("variant"))
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("double").alias("a"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("double").alias("b"),
        )
    )
    a, b = F.col("a"), F.col("b")
    chi2 = (a - b) * (a - b) / (a + b)
    return counts.select(
        a.cast("long").alias("n_control"),
        b.cast("long").alias("n_treatment"),
        eps_round(chi2, 6).alias("chi2_stat"),
        (chi2 > 3.841).alias("srm_detected"),
    )


@query(
    "events_interval_merge",
    """
    WITH iv AS (
      -- null-bounded intervals drop, mirroring merge_intervals' contract
      SELECT user_id, epoch_ms(ts) AS s,
             epoch_ms(ts) + (event_id % 7 + 1) * 90000 AS e
      FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(MIN(s) AS BIGINT) AS merged_start_ms,
           CAST(MAX(e) AS BIGINT) AS merged_end_ms,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM islands GROUP BY user_id, island
    ORDER BY user_id, merged_start_ms
    """,
    tags=("events", "timeseries", "window"),
)
def events_interval_merge(spark, sf_dir):
    """Interval coalescing (merge overlapping/touching intervals per key):
    each event opens a variable-length interval (90s-630s, deterministic
    from event_id) and overlapping ones merge into islands — the classic
    gaps-and-islands-over-DURATIONS operator (uptime stitching, ad-break
    merging, meeting-room occupancy) that point-gap sessionization cannot
    express (a long interval can bridge events whose START times are far
    apart). New island when an interval starts strictly after the running
    max END of all prior intervals.

    Scale shape: one keyed window per user computing the running max end
    (the island flag), one keyed running sum over the same sort — two
    WindowExec nodes (the sum consumes the flag) sharing ONE exchange +
    sort — then a grouped rollup of island members. Runs the canonical
    `operators/intervals.merge_intervals` (the Engine facade's
    `merge_intervals`), not a reimplementation."""
    from dumpr_spark.operators.intervals import merge_intervals

    e = t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    iv = e.select(
        "user_id",
        ms.alias("s"),
        (ms + (F.col("event_id") % 7 + 1) * 90000).alias("e"),
    )
    merged = merge_intervals(iv, ["user_id"], "s", "e")
    return (
        merged.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("merged_start").cast("long").alias("merged_start_ms"),
            F.col("merged_end").cast("long").alias("merged_end_ms"),
            "n_intervals",
        )
        .orderBy("user_id", "merged_start_ms")
    )


@query(
    "events_hourly_profile",
    """
    WITH cells AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
             COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2, 3
    ),
    tot AS (SELECT event_type, SUM(n)::DOUBLE AS tn FROM cells GROUP BY event_type)
    SELECT c.event_type, CAST(c.dow AS INT) AS dow, CAST(c.hod AS INT) AS hod,
           c.n, ROUND(c.n / t.tn + 1e-9, 6) AS share,
           ROUND(c.n / (t.tn / 168.0) + 1e-9, 4) AS load_factor
    FROM cells c JOIN tot t USING (event_type)
    ORDER BY c.event_type, dow, hod
    """,
    tags=("events", "analytics", "timeseries"),
)
def events_hourly_profile(spark, sf_dir):
    """Weekly activity heatmap per event type: the (day-of-week, hour)
    grid with each cell's share of the type's traffic and its load factor
    vs a uniform 168-cell week (1.0 = flat; capacity planning reads peaks
    off this). Spark's dayofweek is 1=Sunday, matching DuckDB's dayofweek
    + 1 shift handled below.

    Scale shape: the raw scan collapses to <= |type| x 168 cells with
    map-side combine; totals derive from the cell table (no second scan);
    everything downstream is grid-sized."""
    cells = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hod"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = cells.groupBy("event_type").agg(F.sum("n").cast("double").alias("tn"))
    return (
        cells.join(tot, "event_type")
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("hod").cast("int").alias("hod"),
            "n",
            eps_round(F.col("n") / F.col("tn"), 6).alias("share"),
            eps_round(F.col("n") / (F.col("tn") / F.lit(168.0)), 4).alias("load_factor"),
        )
        .orderBy("event_type", "dow", "hod")
    )


@query(
    "events_gap_percentiles",
    """
    WITH gaps AS (
      SELECT event_type,
             EXTRACT(EPOCH FROM ts - LAG(ts) OVER (
               PARTITION BY event_type, user_id ORDER BY ts, event_id
             )) AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap_s, 0.5) + 1e-9, 3) AS p50_s,
           ROUND(quantile_cont(gap_s, 0.9) + 1e-9, 3) AS p90_s,
           ROUND(quantile_cont(gap_s, 0.99) + 1e-9, 3) AS p99_s,
           ROUND(MAX(gap_s) + 1e-9, 3) AS max_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("events", "window", "stats"),
)
def events_gap_percentiles(spark, sf_dir):
    """Inter-arrival gap distribution per event type: successive-event
    deltas within each (type, user) stream, rolled into exact interpolated
    p50/p90/p99 — the latency/cadence profile that sizes session timeouts
    and anomaly thresholds (events_sessionize's gap parameter comes from
    exactly this curve). (ts, event_id) ordering makes ties deterministic.

    Scale shape: the lag window is partitioned by (type, user) — high
    cardinality, shuffles once on the natural stream key, no global
    window; the percentile aggregate then reduces gaps to |type| cells
    (exact percentiles need the group's gaps on one reducer — at 100 TB
    swap in approx_percentile or the mergeable t-digest rollup, same
    contract as agg_quantile_mergeable)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(w))).alias("_us"),
    ).where(F.col("_us").isNotNull())
    gap_s = F.col("_us") / F.lit(1000000.0)
    return (
        gaps.select("event_type", gap_s.alias("gap_s"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            eps_round(F.percentile("gap_s", F.lit(0.5)), 3).alias("p50_s"),
            eps_round(F.percentile("gap_s", F.lit(0.9)), 3).alias("p90_s"),
            eps_round(F.percentile("gap_s", F.lit(0.99)), 3).alias("p99_s"),
            eps_round(F.max("gap_s"), 3).alias("max_s"),
        )
        .orderBy("event_type")
    )


@query(
    "events_overdispersion",
    """
    WITH cells AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*)::DOUBLE AS c
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, COUNT(*)::DOUBLE AS n,
             SUM(c) AS s1, SUM(c * c) AS s2
      FROM cells GROUP BY event_type HAVING COUNT(*) > 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           CAST(s1 AS BIGINT) AS n_events,
           ROUND(s1 / n + 1e-9, 4) AS mean_per_hour,
           ROUND((s2 - s1 * s1 / n) / (n - 1) + 1e-9, 4) AS var_per_hour,
           ROUND(((s2 - s1 * s1 / n) / (n - 1)) / (s1 / n) + 1e-9, 4) AS fano,
           ROUND(((s2 - s1 * s1 / n) / (n - 1)) / (s1 / n) + 1e-9, 4) > 1.5
             AS overdispersed
    FROM s ORDER BY event_type
    """,
    tags=("events", "analytics", "stats"),
)
def events_overdispersion(spark, sf_dir):
    """Burstiness detector per event type: the Fano factor
    (variance-to-mean ratio) of the hourly arrival counts. A Poisson
    (memoryless) arrival process has Fano = 1; substantially above
    (> 1.5 here) means bursty/clumped traffic — sessionization gaps,
    rate limits, and capacity buffers sized from the MEAN alone will be
    wrong for such a stream. Complements events_gap_percentiles (which
    looks at inter-arrival TIMES; this looks at windowed COUNT
    dispersion). Hours with zero events are not materialized — the
    statistic is over OBSERVED hours (the gapfilled variant is a
    composition with events_gapfill's grid). Variance from explicit
    power sums (agg_regr_linear's discipline — no engine var_samp
    convention in the contract); types with a single observed hour drop.

    Scale shape: the raw scan collapses to |type| x |hour| cells with
    map-side combine, then three power sums per type over the cell
    table — both aggregations partial-combining, nothing global, and the
    cell table is calendar-bounded (8760 cells/type/year) regardless of
    event volume."""
    cells = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    s = (
        cells.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("c").alias("s1"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
        .where(F.col("n") > 1)
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    return s.select(
        "event_type",
        n.cast("bigint").alias("n_hours"),
        s1.cast("bigint").alias("n_events"),
        eps_round(mean, 4).alias("mean_per_hour"),
        eps_round(var, 4).alias("var_per_hour"),
        eps_round(var / mean, 4).alias("fano"),
        # the boolean is a HARD decision, so it reads the eps-ROUNDED fano
        # (both engines) per the float-determinism rule — s1/s2 are exact
        # integer-valued sums today (counts < 2^53), but deriving from the
        # rounded value keeps the verdict stable even if the cell metric
        # ever becomes a true float
        (eps_round(var / mean, 4) > 1.5).alias("overdispersed"),
    ).orderBy("event_type")
