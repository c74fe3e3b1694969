"""Distributed order statistics beyond the built-ins.

`weighted_median` is the weight-crossing rule: sort by value within each
group, running-sum the weights, take the first value whose cumulative
weight reaches half the group total. Registry demo: `agg_weighted_median`;
the mergeable sketch twin at volume is the histogram family
(functions/sketches.py) with weight-summed bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group weighted median of `value_col` under `weight_col`:
    the smallest value v whose cumulative weight (in ascending value
    order) is >= half the group's total weight. `tiebreak_cols` pins a
    total order for equal values (cross-engine / rerun determinism).

    Returns one row per group: group_cols + (w_median, total_weight).

    Scale: one keyed window per group plus a partial-combining rollup.
    Few-group/giant-group data should use the two-phase distributed
    prefix scan (operators/ntile) or the mergeable histogram sketch
    instead — a window partition is one task's sort."""
    order = [F.col(value_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    cum = df.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        F.sum(weight_col).over(wcum).alias("_cum"),
        F.sum(weight_col).over(wtot).alias("_total"),
    )
    return (
        cum.groupBy(*group_cols)
        .agg(
            F.min(F.when(F.col("_cum") >= F.col("_total") / 2.0, F.col("_v"))).alias(
                "w_median"
            ),
            F.max("_total").alias("total_weight"),
        )
    )
