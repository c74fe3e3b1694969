"""As-of join (latest right row with right_time <= left_time, per key).

Spark has no native ASOF JOIN. Two formulations, picked by shape:

1. `asof_join` (here): union both sides on (key, time) and carry the right
   payload forward with `last_value(..., ignoreNulls)` over a key-partitioned
   window — ONE shuffle on the key, linear in rows, no range-condition join.
   This is the big-big shape (e.g. every trade against its latest quote).
2. Window row_number over a range-joined pair (queries/windows.py:join_asof)
   — fine when one side is small/broadcastable; the range join degenerates to
   O(left x right-per-key) otherwise.

The reference's closest analog is the binlog filename carry
(/root/reference/src/dumpr/stream.clj:56-74): stamp each event with the most
recent marker seen — exactly a last_value carry-forward, which is why the
union trick reuses R5's machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (per `on` key). Right columns come back
    null when no prior right row exists (or it is older than `tolerance`,
    an INTERVAL string like '1 hour').

    Ties on equal timestamps: the right row at exactly left_time wins
    (<=, matching DuckDB ASOF JOIN).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols, F.col(right_time)).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.where(F.col(right_time).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*right_cols, F.col(right_time)).alias("_r"),
    )
    # right rows sort BEFORE left rows at the same timestamp so <= holds; the
    # NULL-right_time filter above keeps nulls-first ordering from carrying a
    # timeless payload into every row. Among right rows tied on (_k, _t) the
    # full _r struct breaks the tie (lexicographic struct compare) so the
    # carried payload is deterministic across runs/partitionings — a pick
    # DuckDB's native ASOF leaves arbitrary.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.asc("_is_left"), F.asc_nulls_last("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_rc", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_is_left") == 1)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "_rc",
            F.when(
                F.col(f"_rc.{right_time}") >= F.col("_t") - F.expr(f"INTERVAL {tolerance}"),
                F.col("_rc"),
            ),
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_rc.{c}").alias(c) for c in right_cols
    ]
    return carried.select(*out_cols)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """direction='nearest' as-of: attach the right row whose time is
    CLOSEST to the left row's (per `on` key), either side. |dt| ties
    prefer the backward (at-or-before) candidate — pandas
    merge_asof(direction='nearest') semantics with a deterministic tie
    rule; among right rows tied on the winning timestamp the greatest
    `_r` payload struct wins (make right_cols[0] a unique id for a
    meaningful pick), same discipline as asof_join.

    Shape: ONE union + ONE shuffle on the key, two window passes over the
    same partitioning (backward carry in time-ascending order, forward
    carry in time-descending order — Spark plans both sorts inside the
    one exchange), then a row-local argmin over the two candidates. No
    range join, no per-key quadratic blowup — the same big-big safety as
    asof_join, at one extra in-partition sort.

    `tolerance` (INTERVAL string) bounds |dt| on BOTH sides; a lone
    candidate outside it comes back NULL."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    r_struct_t = right.select(
        F.struct(*right_cols, F.col(right_time)).alias("s")
    ).schema["s"].dataType
    l_struct_t = left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r_tagged = right.where(F.col(right_time).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_struct_t).alias("_l"),
        F.struct(*right_cols, F.col(right_time)).alias("_r"),
    )
    # backward: ascending time, right rows before left at equal t (<=
    # inclusive), max-struct tie among equal right timestamps (last wins).
    wb = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.asc("_is_left"), F.asc_nulls_last("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: descending time, right rows still first at equal t (>=
    # inclusive); _r ASC within the tie group makes `last` the max struct
    # there too — both directions agree on the tie pick.
    wf = (
        Window.partitionBy("_k")
        .orderBy(F.desc("_t"), F.asc("_is_left"), F.asc_nulls_last("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l_tagged.unionByName(r_tagged)
    carried = (
        u.withColumn("_rb", F.last("_r", ignorenulls=True).over(wb))
        .withColumn("_rf", F.last("_r", ignorenulls=True).over(wf))
        .where(F.col("_is_left") == 1)
    )
    # µs, not ms: the |dt| argmin must compare at full timestamp precision
    # or two candidates straddling the same millisecond tie wrongly (the
    # ms-vs-µs landmine test_asof_props generates on purpose — it caught
    # exactly this in review)
    lt_us = F.unix_micros(F.col("_t").cast("timestamp"))
    dtb = lt_us - F.unix_micros(F.col(f"_rb.{right_time}").cast("timestamp"))
    dtf = F.unix_micros(F.col(f"_rf.{right_time}").cast("timestamp")) - lt_us
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        carried = carried.withColumn(
            "_rb",
            F.when(F.col(f"_rb.{right_time}") >= F.col("_t") - bound, F.col("_rb")),
        ).withColumn(
            "_rf",
            F.when(F.col(f"_rf.{right_time}") <= F.col("_t") + bound, F.col("_rf")),
        )
    # a NULL left time has no |dt| to minimize -> NULL right columns
    # (matches asof_join; without the guard the forward carry's DESC
    # ordering would hand the min-timestamp right row to a NULL-t left)
    nearest = F.when(
        F.col("_t").isNotNull(),
        F.when(F.col("_rb").isNull(), F.col("_rf"))
        .when(F.col("_rf").isNull(), F.col("_rb"))
        .when(dtb <= dtf, F.col("_rb"))  # |dt| tie -> backward
        .otherwise(F.col("_rf")),
    )
    carried = carried.withColumn("_rn", nearest)
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_rn.{c}").alias(c) for c in right_cols
    ]
    return carried.select(*out_cols)
