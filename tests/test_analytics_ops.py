"""Properties of the round-4 analytics wave that the SQL oracle can't pin:
the mergeability contract of the fixed-bin quantile sketch, OHLC bar
invariants, and MAD anomaly-rate sanity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpr_spark.sources.files import load_table


def test_quantile_sketch_merge_is_lossless(spark, sf_dir):
    """THE mergeability contract: summing per-day bin counts must equal the
    single-pass histogram over the raw data, bin for bin — merge loses
    nothing (unlike GK/KLL, where merge widens the error). This is what
    makes the daily-sketch -> any-time-range rollup valid at 100 TB."""
    from dumpr_spark.functions.sketches import bin_index

    e = load_table(spark, sf_dir, "events")
    bin_col = bin_index("value", 5.0, 100)
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"), bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("event_type", "bin").agg(F.sum("c").alias("c"))
    )
    direct = e.groupBy("event_type", bin_col.alias("bin")).agg(F.count(F.lit(1)).alias("c"))
    assert daily.exceptAll(direct).count() == 0
    assert direct.exceptAll(daily).count() == 0


def test_quantile_sketch_within_bin_of_exact(spark, sf_dir):
    """The estimate must land within two bin widths of the exact
    interpolated percentile. This is an EMPIRICAL bound for this data's
    dense bins (the structural guarantee is only bin-containment of the
    ceil(q*n)-th order statistic; a sparse tail could interpolate further
    away) — the query's within_bin column asserts the same bound, so this
    test failing on new testdata means the oracle needs re-deriving too."""
    from dumpr_spark.queries import REGISTRY

    rows = REGISTRY["agg_quantile_mergeable"].fn(spark, sf_dir).collect()
    assert rows and all(r["within_bin"] for r in rows)


def test_ohlc_bar_invariants(spark, sf_dir):
    """Every bar: low <= open/close <= high, n_ticks >= 1, and total tick
    count across bars equals the event count (no row lost or duplicated by
    the min_by/max_by aggregation)."""
    from dumpr_spark.queries import REGISTRY

    rows = REGISTRY["rollup_ohlc"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low"] - 1e-9 <= r["open"] <= r["high"] + 1e-9
        assert r["low"] - 1e-9 <= r["close"] <= r["high"] + 1e-9
        assert r["n_ticks"] >= 1
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_ticks"] for r in rows) == n_events


def test_ohlc_open_close_respect_time_order(spark, sf_dir):
    """open/close must be the FIRST/LAST tick by (ts, event_id) — checked
    against an independent window formulation on one hour of data."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(
        F.date_trunc("hour", "ts") == F.lit("2024-01-03 12:00:00").cast("timestamp_ntz")
    )
    if e.count() == 0:  # testdata variant without that hour
        import pytest

        pytest.skip("pinned hour absent from this testdata variant")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    expected = {
        (r["event_type"]): (r["open"], r["close"])
        for r in e.withColumn("open", F.first("value").over(w))
        .withColumn(
            "close",
            F.last("value").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .groupBy("event_type")
        .agg(F.min("open").alias("open"), F.min("close").alias("close"))
        .collect()
    }
    from dumpr_spark.queries import REGISTRY

    got = {
        r["event_type"]: (r["open"], r["close"])
        for r in REGISTRY["rollup_ohlc"].fn(e.sparkSession, sf_dir).collect()
        if str(r["h"]) == "2024-01-03 12:00:00"
    }
    for k, v in got.items():
        assert expected[k] == v


def test_mad_anomaly_rate_sane(spark, sf_dir):
    """3-sigma-equivalent MAD flags must mark a small minority of rows
    (uniform-ish data: a fat tail beyond 3 scaled MADs), never zero columns
    of the stats themselves."""
    from dumpr_spark.queries import REGISTRY

    rows = REGISTRY["events_anomaly_mad"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mad"] > 0
        assert 0 <= r["n_anomalies"] <= 0.25 * r["n_total"]


def test_cusum_finds_injected_level_shift(spark):
    """Semantic check the oracle can't make: on a series with a known level
    shift, the max-|cusum| position must land exactly at the last point of
    the pre-shift regime (the classic CUSUM changepoint estimate)."""
    from pyspark.sql import Window

    # 40 points at level 10, then 40 at level 30 -> shift after index 40
    rows = [(i, float(10 if i <= 40 else 30)) for i in range(1, 81)]
    df = spark.createDataFrame(rows, "i INT, value DOUBLE")
    mu = df.agg(F.avg("value").alias("mu"))
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    walked = df.crossJoin(F.broadcast(mu)).withColumn(
        "cusum", F.sum(F.col("value") - F.col("mu")).over(w)
    )
    cp = (
        walked.orderBy(F.desc(F.abs(F.col("cusum"))), F.asc("i"))
        .limit(1)
        .collect()[0]
    )
    assert cp["i"] == 40, cp


def test_welch_t_zero_for_identical_and_large_for_shifted(spark):
    """Two identical samples must give t == 0; shifting one sample far from
    the other must give |t| >> 2 (the ~95% significance threshold) — the
    direction/magnitude semantics of the query's formula."""
    from dumpr_spark.queries import REGISTRY  # noqa: F401  (formula parity lives in the query)

    a = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8)]

    def welch_t(x, y):
        df = spark.createDataFrame(
            [("x", v) for v in x] + [("y", v) for v in y], "g STRING, value DOUBLE"
        )
        r = df.groupBy().agg(
            F.avg(F.when(F.col("g") == "x", F.col("value"))).alias("m1"),
            F.var_samp(F.when(F.col("g") == "x", F.col("value"))).alias("v1"),
            F.count(F.when(F.col("g") == "x", 1)).alias("n1"),
            F.avg(F.when(F.col("g") == "y", F.col("value"))).alias("m2"),
            F.var_samp(F.when(F.col("g") == "y", F.col("value"))).alias("v2"),
            F.count(F.when(F.col("g") == "y", 1)).alias("n2"),
        ).collect()[0]
        import math

        return (r["m1"] - r["m2"]) / math.sqrt(r["v1"] / r["n1"] + r["v2"] / r["n2"])

    assert welch_t(a, a) == 0.0
    shifted = [v + 50 for v in a]
    assert abs(welch_t(a, shifted)) > 10


def test_weighted_median_matches_numpy_replica(spark):
    """Property over random weighted samples: the weight-crossing rule
    equals a direct cumulative-weight computation, and degenerates to the
    plain lower median when all weights are 1."""
    import random

    from dumpr_spark.functions.stats import weighted_median

    rng = random.Random(7)
    rows = []
    for g in ("a", "b", "c"):
        for i in range(rng.randint(5, 40)):
            rows.append((g, i, float(rng.randint(0, 50)), float(rng.randint(1, 9))))
    df = spark.createDataFrame(rows, "g string, rid long, v double, w double")
    got = {
        r["g"]: (r["w_median"], r["total_weight"])
        for r in weighted_median(df, ["g"], "v", "w", tiebreak_cols=["rid"]).collect()
    }

    for g in ("a", "b", "c"):
        sample = sorted((v, rid, w) for gg, rid, v, w in rows if gg == g)
        total = sum(w for _v, _r, w in sample)
        cum, want = 0.0, None
        for v, _rid, w in sample:
            cum += w
            if cum >= total / 2.0:
                want = v
                break
        assert got[g] == (want, total), g

    ones = df.withColumn("w", df.w * 0 + 1.0)
    got1 = {r["g"]: r["w_median"] for r in weighted_median(ones, ["g"], "v", "w").collect()}
    for g in ("a", "b", "c"):
        vals = sorted(v for gg, _r, v, _w in rows if gg == g)
        lower_median = vals[(len(vals) - 1) // 2]
        assert got1[g] == lower_median, g


def test_kendall_tau_matches_bruteforce(spark):
    """Property over random TIED ordinal samples: the contingency-grid
    form (O(grid) windows, no pair ever formed) equals the O(n^2)
    definition — every pair classified concordant / discordant / tied —
    including the tau-b tie correction; plus the three textbook anchors
    (perfect agreement +1, perfect reversal -1, ties capping |tau| < 1
    without the correction but = 1 with it on a duplicated monotone
    sequence)."""
    import itertools
    import math
    import random

    from dumpr_spark.functions.stats import kendall_tau_b

    def brute(pairs):
        n = len(pairs)
        conc = disc = tx = ty = 0
        for (x1, y1), (x2, y2) in itertools.combinations(pairs, 2):
            if x1 == x2:
                tx += 1
            if y1 == y2:
                ty += 1
            if x1 == x2 or y1 == y2:
                continue
            if (x1 < x2) == (y1 < y2):
                conc += 1
            else:
                disc += 1
        n0 = n * (n - 1) // 2
        tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
        return n, conc, disc, tx, ty, tau

    rng = random.Random(11)
    for trial in range(3):
        pairs = [(rng.randint(0, 6), rng.randint(0, 4)) for _ in range(120)]
        df = spark.createDataFrame(pairs, "x int, y int")
        got = kendall_tau_b(df, "x", "y").collect()[0]
        n, conc, disc, tx, ty, tau = brute(pairs)
        assert (got["n"], got["concordant"], got["discordant"],
                got["ties_x"], got["ties_y"]) == (n, conc, disc, tx, ty), trial
        assert abs(got["tau_b"] - tau) < 1e-6, trial

    mono = [(i, i * 10) for i in range(20)]
    assert kendall_tau_b(
        spark.createDataFrame(mono, "x int, y int"), "x", "y"
    ).collect()[0]["tau_b"] == 1.0
    rev = [(i, -i) for i in range(20)]
    assert kendall_tau_b(
        spark.createDataFrame(rev, "x int, y int"), "x", "y"
    ).collect()[0]["tau_b"] == -1.0
    # duplicated monotone sequence: ties on both margins, tau-b still 1
    dup = [(i // 2, (i // 2) * 3) for i in range(20)]
    assert kendall_tau_b(
        spark.createDataFrame(dup, "x int, y int"), "x", "y"
    ).collect()[0]["tau_b"] == 1.0
    # NULLs drop via pairwise deletion (counting them in the tie margins
    # while the grid join skipped them would break n0 - T consistency and
    # crash the division — the r11 review's confirmed repro)
    withnulls = [(1, 1), (2, 2), (3, 3), (None, 1), (None, 2), (3, None)]
    r = kendall_tau_b(
        spark.createDataFrame(withnulls, "x int, y int"), "x", "y"
    ).collect()[0]
    assert (r["n"], r["tau_b"]) == (3, 1.0)
    assert (r["ties_x"], r["ties_y"]) == (0, 0)
    # constant column: zero denominator -> NULL tau, counts still exact
    const = [(7, i) for i in range(5)]
    r = kendall_tau_b(
        spark.createDataFrame(const, "x int, y int"), "x", "y"
    ).collect()[0]
    assert r["tau_b"] is None and r["ties_x"] == 10 and r["concordant"] == 0


def test_kendall_cells_merge_is_lossless(spark):
    """The mergeability contract: per-shard contingency grids summed
    cell-wise give EXACTLY the one-shot result — same pair counts, same
    tau — for any sharding (here 3 uneven shards of a random tied
    sample). This is what lets per-day grids answer tau over any time
    range without rescanning history."""
    import random

    from pyspark.sql import functions as F

    from dumpr_spark.functions.stats import (
        kendall_tau_b, kendall_tau_from_cells,
    )

    rng = random.Random(23)
    rows = [(rng.randint(0, 5), rng.randint(0, 3)) for _ in range(150)]
    df = spark.createDataFrame(rows, "x int, y int")
    want = kendall_tau_b(df, "x", "y").collect()[0]

    shards = [rows[:20], rows[20:90], rows[90:]]
    cell_frames = [
        spark.createDataFrame(s, "x int, y int")
        .groupBy(F.col("x").alias("_x"), F.col("y").alias("_y"))
        .agg(F.count(F.lit(1)).alias("_c"))
        for s in shards
    ]
    union = cell_frames[0]
    for cf in cell_frames[1:]:
        union = union.unionByName(cf)
    merged = union.groupBy("_x", "_y").agg(F.sum("_c").alias("_c"))
    got = kendall_tau_from_cells(merged).collect()[0]
    assert got.asDict() == want.asDict()


def test_kendall_empty_input_and_bigint_overflow_guard(spark):
    """The output-projection contract edges (r11 advice): a fully EMPTY
    input returns all five counts as exact 0 (not the NULL an empty
    aggregate's sums would leak) with NULL tau; and a count past the
    bigint output bound RAISES loudly instead of the silent NULL a
    non-ANSI decimal->bigint cast returns — fabricated via the
    mergeable-cells entry point, since ~3e9 real tied rows are not a
    test. The raise message points at keeping the decimal cell grid."""
    import pytest

    from pyspark.sql import functions as F

    from dumpr_spark.functions.stats import (
        kendall_tau_b, kendall_tau_from_cells,
    )

    r = kendall_tau_b(
        spark.createDataFrame([], "x int, y int"), "x", "y"
    ).collect()[0]
    assert (r["n"], r["concordant"], r["discordant"],
            r["ties_x"], r["ties_y"]) == (0, 0, 0, 0, 0)
    assert r["tau_b"] is None
    # all-NULL rows reduce to the empty case through pairwise deletion
    r = kendall_tau_b(
        spark.createDataFrame([(None, 1), (2, None)], "x int, y int"),
        "x", "y",
    ).collect()[0]
    assert r["n"] == 0 and r["tau_b"] is None

    # one cell of 2^62 tied rows: doubled tie-pair count m(m-1) ~ 2^124
    # overflows bigint by ~37 decimal orders — the guard must fire
    huge = spark.createDataFrame(
        [(1, 1)], "_x int, _y int"
    ).select("_x", "_y", F.lit(2 ** 62).cast("decimal(38,0)").alias("_c"))
    with pytest.raises(Exception, match="exceeds the bigint output contract"):
        kendall_tau_from_cells(huge).collect()
