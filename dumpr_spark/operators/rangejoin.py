"""Bucketed interval (range) join — the scale path for non-equi time joins.

A pure range join (`event.ts BETWEEN interval.start AND interval.end` with
no equi key) has no hash key, so Catalyst must fall back to
`BroadcastNestedLoopJoin`: O(|events| x |intervals|) comparisons, and only
viable at all while one side fits in a broadcast. At 100 TB neither holds.

The classic fix (same trick as Spark's own range-join bucketing hints and
interval trees in KDB/TimescaleDB): quantize time into fixed-width buckets,

- each *event* lands in exactly one bucket (`floor(epoch / width)`),
- each *interval* is exploded to the buckets it overlaps
  (`sequence(floor(start/w), floor(end/w))` — cheap while intervals are
  short relative to the bucket width),

then an ordinary shuffle/broadcast **equi-join on the bucket id** pairs each
event only with intervals overlapping its bucket, and the exact `BETWEEN`
predicate filters within the bucket. Cost: |events| + |intervals| x
(avg_len / width) shuffled rows — linear, partitionable, AQE-skew-handled,
instead of quadratic. Each (event, interval) pair meets exactly once
(the event's single bucket), so no distinct pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucketed_interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join each event row to every interval row with
    start <= ts < end (half-open), via bucket equi-join.
    Returns all columns of both inputs (names must not collide).

    Outer semantics (keep empty intervals) are NOT a join flag here on
    purpose: an outer bucket join would emit one null row per *unmatched
    (interval, bucket)* pair, duplicating empty intervals. The correct outer
    shape is inner-join -> aggregate -> left-join the aggregate back onto the
    intervals (see queries/training.py:join_range_bucketed).
    """
    # bucket from MICROsecond epochs: unix_timestamp() truncates to seconds,
    # which would drop events in an interval's final fractional second (an
    # end of 01:00:00.5 must still list bucket 1 for an event at 01:00:00.2)
    w_us = F.lit(bucket_seconds * 1_000_000)

    def bkt(c):
        return F.floor(F.unix_micros(F.col(c).cast("timestamp")) / w_us).cast("long")

    ev = events.withColumn("_bkt", bkt(ts_col))
    # end is exclusive: an interval touching a bucket boundary exactly at its
    # end must not be listed in that bucket. The greatest() clamp guards
    # empty/inverted intervals (end <= start): Spark sequences run BACKWARDS
    # when stop < start, so an unclamped bad interval would fan out a huge
    # descending bucket array; clamped it emits one row that the exact
    # BETWEEN filter below drops.
    s_bkt = bkt(start_col)
    e_bkt = F.floor((F.unix_micros(F.col(end_col).cast("timestamp")) - 1) / w_us).cast("long")
    iv = intervals.withColumn(
        "_bkts", F.sequence(s_bkt, F.greatest(e_bkt, s_bkt))
    ).withColumn("_bkt", F.explode("_bkts")).drop("_bkts")
    cond = (
        (ev["_bkt"] == iv["_bkt"])
        & (ev[ts_col] >= iv[start_col])
        & (ev[ts_col] < iv[end_col])
    )
    return ev.join(iv, cond, "inner").drop("_bkt")


def bucketed_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval x interval OVERLAP join (half-open: l_start < r_end AND
    r_start < l_end), bucketed like `bucketed_interval_join`. BOTH sides
    explode to their covered buckets, so a pair overlapping several buckets
    meets several times — deduped by keeping the pair only in the FIRST
    bucket both sides cover (the max of the two carried start buckets),
    which needs no distinct shuffle.
    """
    w_us = F.lit(bucket_seconds * 1_000_000)

    def expand(df, s, e, tag):
        s_bkt = F.floor(F.unix_micros(F.col(s).cast("timestamp")) / w_us).cast("long")
        e_bkt = F.floor((F.unix_micros(F.col(e).cast("timestamp")) - 1) / w_us).cast("long")
        return df.withColumn(f"_{tag}_s_bkt", s_bkt).withColumn(
            "_bkt", F.explode(F.sequence(s_bkt, F.greatest(e_bkt, s_bkt)))
        )

    lv = expand(left, l_start, l_end, "l")
    rv = expand(right, r_start, r_end, "r")
    pairs = lv.join(rv, "_bkt").where(
        (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
        # keep each overlapping pair exactly once: in the first shared bucket
        & (F.col("_bkt") == F.greatest(F.col("_l_s_bkt"), F.col("_r_s_bkt")))
    )
    return pairs.drop("_bkt", "_l_s_bkt", "_r_s_bkt")
