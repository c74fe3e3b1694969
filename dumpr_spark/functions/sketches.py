"""Mergeable fixed-bin histogram sketches for distributed quantiles.

The 100 TB pattern for percentiles (companion to the HLL pattern for
distinct counts): partial jobs persist a small fixed-bin histogram per
group; any subset of partials merges by SUMMING bin counts (associative,
commutative, and — unlike GK/KLL — LOSSLESS and deterministic), and a
quantile is interpolated inside the first bin whose cumulative count
crosses q*n. Because every step is deterministic integer/bin arithmetic,
estimates are reproducible across engines and hash-checkable against a SQL
oracle (queries.relational.agg_quantile_mergeable).

Error contract: the estimate always lies inside the bin containing the
ceil(q*n)-th order statistic (structural, property-tested); distance to the
exact interpolated percentile is additionally bounded by bin width only
when the crossing bin's neighborhood is populated.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def bin_index(value_col, bin_width: float = 5.0, n_bins: int = 100):
    """THE bin expression, shared by every sketch producer (batch build,
    streaming rollup vectors, oracle parity): clamp(floor(value/width), 0,
    n_bins-1), and NULL for NULL input. The NULL guard matters — Spark's
    least/greatest SKIP nulls, so the unguarded clamp would silently file
    NULL values into the top bin (least(NULL, 99) = 99) and inflate
    high-quantile estimates."""
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.when(
        col.isNotNull(),
        F.greatest(
            F.least(F.floor(col / bin_width).cast("long"), F.lit(n_bins - 1)),
            F.lit(0),
        ),
    )


def histogram_bins(
    df: DataFrame,
    value_col: str = "value",
    group_cols: Sequence[str] = ("event_type",),
    bin_width: float = 5.0,
    n_bins: int = 100,
    extra_keys: Sequence = (),
) -> DataFrame:
    """Partial-build: per (group, *extra_keys) fixed-bin counts.

    bin = clamp(floor(value / bin_width), 0, n_bins-1) — clamped on BOTH
    ends so out-of-range values land in the edge bins instead of growing
    the sketch; NULL values are EXCLUDED (they are not a measurement, and
    counting them anywhere would bias an edge bin). One partial-combining
    aggregation; the shuffle carries at most |groups| x |extra_keys| x
    n_bins rows regardless of input size. `extra_keys` is the partial
    dimension (e.g. the day column) that `merge_bins` later folds away."""
    bin_col = bin_index(value_col, bin_width, n_bins)
    return (
        df.where(bin_col.isNotNull())
        .groupBy(*group_cols, *extra_keys, bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def merge_bins(bins: DataFrame, group_cols: Sequence[str] = ("event_type",)) -> DataFrame:
    """Merge partial histograms by summing bin counts — the mergeability
    contract (lossless: property-tested equal to a single-pass build)."""
    return bins.groupBy(*group_cols, "bin").agg(F.sum("c").alias("c"))


def histogram_quantiles(
    bins: DataFrame,
    qs: Sequence[float],
    group_cols: Sequence[str] = ("event_type",),
    bin_width: float = 5.0,
) -> DataFrame:
    """Estimate quantiles from merged bins: for each q, interpolate inside
    the first bin whose cumulative count reaches q*n.

    Output: (*group_cols, q, est) — long format, one row per group per q.
    The windows run over the BIN table (<= n_bins rows per group), never
    the raw data; the q fan-out is a broadcast of |qs| literals."""
    spark = bins.sparkSession
    gc = list(group_cols)
    w_cum = Window.partitionBy(*gc).orderBy("bin")
    w_all = Window.partitionBy(*gc)
    cum = bins.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )
    q_df = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    crossed = cum.crossJoin(F.broadcast(q_df)).where(
        F.col("cum") >= F.col("q") * F.col("n")
    )
    w_pick = Window.partitionBy(*gc, "q").orderBy("bin")
    est = (
        F.col("bin") * bin_width
        + bin_width
        * (F.col("q") * F.col("n") - (F.col("cum") - F.col("c")))
        / F.col("c")
    )
    return (
        crossed.withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == 1)
        .select(*gc, "q", est.alias("est"))
    )
