"""Distributed order statistics beyond the built-ins.

`weighted_median` is the weight-crossing rule: sort by value within each
group, running-sum the weights, take the first value whose cumulative
weight reaches half the group total. Registry demo: `agg_weighted_median`;
the mergeable sketch twin at volume is the histogram family
(functions/sketches.py) with weight-summed bins.

`kendall_tau_b` is the contingency-grid form of Kendall's rank
correlation: the scan collapses to |X| x |Y| cell counts, and concordant/
discordant pair totals come from 2D prefix sums over the dense grid —
never a pairwise join. Registry demo: `agg_kendall_tau`.
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


def kendall_tau_b(df: DataFrame, x: str, y: str,
                  round_digits: int = 6) -> DataFrame:
    """Kendall's tau-b rank correlation of two ORDINAL columns, computed
    from the contingency grid — the tie-robust third leg of the rank-
    statistics family (Pearson: agg_corr_covar, Spearman:
    agg_spearman_corr). tau-b = (C - D) / sqrt((n0 - Tx)(n0 - Ty)) with
    C/D the concordant/discordant pair counts, n0 = n(n-1)/2, and Tx/Ty
    the same-value pair counts per margin (the tie correction that keeps
    |tau| reaching 1 under ties).

    Scale shape: the full scan collapses to |X| x |Y| cell counts (one
    map-side-combined groupBy — the only pass over the data); the dense
    grid (distinct-x BROADCAST-crossed with distinct-y, missing cells
    zero-filled) then carries two cascaded cumulative windows — over y
    within each x, then over x within each y — giving every cell its
    strictly-less / strictly-greater quadrant totals, so C = sum(c * P)
    and D = sum(c * Q) without ever forming a pair. Every window is
    PARTITIONED (never a global sort) and runs over grid rows, not data
    rows. The contingency contract: both columns must be low-cardinality
    ordinals (the grid shuffles |X| * |Y| cells); continuous inputs get
    bucketed first — the standard practice, and the bucketing IS the tie
    structure tau-b exists to correct for.

    Determinism: cell counts and all pair totals are exact integers
    accumulated in decimal(38,0) (the agg_spearman_corr headroom
    discipline). The tie and n0 terms are carried DOUBLED (m(m-1),
    n(n-1) — products of consecutive integers, no halving, so the
    decimal path never leaves exact integer arithmetic: Spark's `div`
    would silently collapse decimal to a wrapping BIGINT, and decimal
    `/` caps scale and rounds near the precision edge); the single
    halving happens on the bigint OUTPUT columns (exact — the doubled
    counts are even) and in the tau denominator as a double (exact to
    2^53). tau is the one double, eps-rounded at output. The bigint
    output type bounds every projected count at ~9.2e18 — i.e. ~3e9
    tied rows per margin (their pair counts carry doubled) and ~4e9
    total rows (C/D ~ n^2/2) — and that bound is ENFORCED: a count
    past it RAISES (the loud-failure discipline) instead
    of the silent NULL a non-ANSI decimal->bigint cast would return;
    callers past the bound keep the decimal grid
    (`kendall_tau_from_cells` input cells merge exactly) and derive tau
    without the bigint projection.

    NULL policy: rows with a NULL in either column are dropped up front
    (pairwise deletion, the standard tau-b convention) — they carry no
    order information, and counting them in the tie margins while the
    grid's equi-join drops them would break n0 - T consistency. A
    degenerate input (constant column after deletion) has a zero
    denominator: tau_b comes back NULL rather than a raise, the counts
    still exact; a fully EMPTY input likewise returns NULL tau with all
    five counts 0 (not NULL — the empty aggregate's NULL sums are
    coalesced so the counts keep their exact-integer contract).

    Returns one row: n, concordant, discordant, ties_x, ties_y (pair
    counts, exact) + tau_b."""
    pts = (
        df.select(F.col(x).alias("_x"), F.col(y).alias("_y"))
        .where(F.col(x).isNotNull() & F.col(y).isNotNull())
    )
    # the ONE pass over the data; every other frame below derives from
    # these |X| x |Y| cells (margins = per-axis cell sums, distinct
    # values = cell keys), so input size enters exactly once
    cells = pts.groupBy("_x", "_y").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return kendall_tau_from_cells(cells, round_digits=round_digits)


def kendall_tau_from_cells(cells: DataFrame,
                           round_digits: int = 6) -> DataFrame:
    """Kendall tau-b from a PRE-AGGREGATED contingency-cell frame
    (columns `_x`, `_y`, `_c`) — the mergeable-sketch entry point: cell
    counts are associative+commutative under summation, so per-shard
    (per-day, per-partition, per-source) grids persist independently and
    ANY subset merges by `SUM(_c) GROUP BY _x, _y` before this call —
    tau over a sliding corpus without rescanning history, exactly the
    histogram-quantile / HLL discipline extended to rank statistics.
    `kendall_tau_b` is the one-shot form (raw rows -> cells -> here)."""
    dec = "decimal(38,0)"
    cells = cells.select(
        "_x", "_y", F.col("_c").cast(dec).alias("_c")
    ).localCheckpoint(eager=False)
    gx = cells.select("_x").distinct()
    gy = cells.select("_y").distinct()
    grid = (
        gx.crossJoin(F.broadcast(gy))
        .join(cells, ["_x", "_y"], "left")
        .select("_x", "_y",
                F.coalesce(F.col("_c"), F.lit(0).cast(dec)).alias("_c"))
    )
    zero = F.lit(0).cast(dec)
    w_lt_y = (Window.partitionBy("_x").orderBy(F.asc("_y"))
              .rowsBetween(Window.unboundedPreceding, -1))
    w_gt_y = (Window.partitionBy("_x").orderBy(F.desc("_y"))
              .rowsBetween(Window.unboundedPreceding, -1))
    cum = grid.select(
        "_x", "_y", "_c",
        F.coalesce(F.sum("_c").over(w_lt_y), zero).alias("_lt"),
        F.coalesce(F.sum("_c").over(w_gt_y), zero).alias("_gt"),
    )
    w_lt_x = (Window.partitionBy("_y").orderBy(F.asc("_x"))
              .rowsBetween(Window.unboundedPreceding, -1))
    pq = cum.select(
        "_c",
        F.coalesce(F.sum("_lt").over(w_lt_x), zero).alias("_p"),
        F.coalesce(F.sum("_gt").over(w_lt_x), zero).alias("_q"),
    )
    tots = pq.agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_c") * F.col("_p")).alias("_conc"),
        F.sum(F.col("_c") * F.col("_q")).alias("_disc"),
    )
    # DOUBLED margin tie-pair counts: sum of m(m-1) per distinct value —
    # margins derive from the tiny cells frame, never a second data scan
    def _ties2(col):
        marg = cells.groupBy(col).agg(F.sum("_c").alias("_m"))
        return marg.agg(
            F.sum(F.col("_m") * (F.col("_m") - 1)).cast(dec).alias("_t2")
        )
    tx, ty = _ties2("_x"), _ties2("_y")
    joined = (
        tots.crossJoin(F.broadcast(tx.select(F.col("_t2").alias("_tx2"))))
        .crossJoin(F.broadcast(ty.select(F.col("_t2").alias("_ty2"))))
    )
    n0_2 = (F.col("_n") * (F.col("_n") - 1)).cast(dec)  # doubled n0
    # doubled terms halve as doubles inside the sqrt (exact to 2^53)
    tau = (
        (F.col("_conc") - F.col("_disc")).cast("double")
        / F.sqrt(((n0_2 - F.col("_tx2")).cast("double") / 2.0)
                 * ((n0_2 - F.col("_ty2")).cast("double") / 2.0))
    )
    # constant/empty margins make the denominator zero — NULL tau, no raise
    tau = F.when(
        (n0_2 > F.col("_tx2")) & (n0_2 > F.col("_ty2")), tau
    )
    # exact bigint projection of a decimal(38,0) count: empty-input NULL
    # sums coalesce to 0, and a value past the bigint bound RAISES — the
    # non-ANSI decimal->bigint cast would silently return NULL there
    bigmax = F.lit("9223372036854775807").cast(dec)

    def out_count(col, name, halve=False):
        v = F.coalesce(F.col(col), zero)
        guarded = F.when(
            v > bigmax,
            F.raise_error(
                F.lit(
                    f"kendall_tau: {name} exceeds the bigint output "
                    "contract — keep the decimal cell grid "
                    "(kendall_tau_from_cells input) instead of this "
                    "projection"
                )
            ).cast(dec),
        ).otherwise(v).cast("bigint")
        if halve:
            # div is exact integral on bigint; the doubled counts are even
            guarded = F.call_function("div", guarded, F.lit(2).cast("bigint"))
        return guarded.cast("bigint").alias(name)

    return joined.select(
        out_count("_n", "n"),
        out_count("_conc", "concordant"),
        out_count("_disc", "discordant"),
        out_count("_tx2", "ties_x", halve=True),
        out_count("_ty2", "ties_y", halve=True),
        # eps-rounded like every ranked double (the r7 flake-class rule)
        F.round(tau + F.lit(1e-9), round_digits).alias("tau_b"),
    )
