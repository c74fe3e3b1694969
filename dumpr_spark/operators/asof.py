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
