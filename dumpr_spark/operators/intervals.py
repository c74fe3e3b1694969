"""Interval coalescing — merge overlapping/touching intervals per key.

The gaps-and-islands-over-DURATIONS operator (uptime stitching, ad-break
merging, meeting-room occupancy): an interval starts a new island exactly
when it begins strictly after the running maximum END of every interval
sorted before it; islands then collapse with min(start)/max(end). Point-gap
sessionization (session_window) cannot express this — a long interval can
bridge rows whose START times are arbitrarily far apart.

Scale shape: one keyed window computing the running max end (the island
flag) and one keyed running sum over the same (start, end) sort — Spark
plans both WindowExec nodes over a single exchange + sort — then a grouped
rollup of island members. No self-join, no range join; cost is one shuffle
of (key, start, end) triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Collapse overlapping/touching [start, end] intervals per key.

    Output: key_cols + (merged_start, merged_end, n_intervals), one row per
    merged island. Intervals touching end-to-start (start == prior end)
    MERGE (the closed-interval convention; pre-shrink ends by an epsilon
    for half-open semantics). start/end may be any mutually comparable
    orderable type; ties on (start, end) are deterministic because the
    island flag depends only on values, not row order. Null-bounded
    intervals are dropped before the fold (matching the streaming twin
    `streaming_interval_merge`): a null start would sort first and join
    island 0 with a NULL island flag, silently inflating counts.
    """
    df = df.where(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
    keys = [F.col(k) for k in key_cols]
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.select(
        *keys,
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        F.when(F.col(start_col) > F.max(end_col).over(w_prev), 1)
        .otherwise(0)
        .alias("_new_island"),
    )
    w_run = (
        Window.partitionBy(*keys)
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        *keys, "_s", "_e", F.sum("_new_island").over(w_run).alias("_island")
    )
    return (
        islands.groupBy(*keys, F.col("_island"))
        .agg(
            F.min("_s").alias("merged_start"),
            F.max("_e").alias("merged_end"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .drop("_island")
    )
