"""Property tests for the two-phase distributed NTILE
(dumpr_spark.operators.ntile.global_ntile) against Spark's own single-window
``ntile(k)`` — the r3 verdict's evidence gap: the offset/cutoff arithmetic
(`big`/`base`/`cutoff`) has edge cases (n < k, n == k, ties at tile
boundaries, all-equal values, NULLs, skewed approxQuantile bounds) that one
oracle query at one scale cannot pin.

The single-window form is semantically exact (it is what the operator
replaces); on test-sized data its single-task sort is harmless, so it serves
as the oracle here while the production path never uses it.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window, functions as F

from dumpr_spark.operators.ntile import global_ntile


def _reference_ntile(df, k, val_col, id_col, descending=True):
    order = (
        [F.desc_nulls_last(val_col), F.asc(id_col)]
        if descending
        else [F.asc_nulls_last(val_col), F.asc(id_col)]
    )
    return df.withColumn("expected", F.ntile(k).over(Window.orderBy(*order)))


def _compare(spark, rows, k, descending=True):
    df = spark.createDataFrame(rows, "id LONG, v DOUBLE")
    got = global_ntile(df, k, "v", "id", out_col="tile", descending=descending)
    ref = _reference_ntile(df, k, "v", "id", descending=descending).select("id", "expected")
    merged = got.join(ref, "id").select("id", "v", "tile", "expected")
    bad = merged.where(F.col("tile") != F.col("expected")).collect()
    assert not bad, f"k={k} desc={descending}: {bad[:10]}"
    assert got.count() == len(rows)


CASES = [
    # (n, k, value generator) — deterministic seeds, edge-shaped data
    (0, 4, lambda rng, i: 0.0),                      # empty input
    (1, 4, lambda rng, i: 5.0),                      # n < k, single row
    (3, 4, lambda rng, i: float(i)),                 # n < k
    (4, 4, lambda rng, i: float(i)),                 # n == k exactly
    (5, 4, lambda rng, i: 1.0),                      # all-equal values (pure tie-break)
    (17, 4, lambda rng, i: float(rng.randint(0, 3)), ),   # heavy ties at boundaries
    (40, 7, lambda rng, i: rng.random()),            # n % k != 0
    (60, 3, lambda rng, i: rng.choice([0.0, 0.0, 0.0, 9.9])),  # skewed distribution
    (50, 1, lambda rng, i: rng.random()),            # k = 1 (everything tile 1)
    (25, 25, lambda rng, i: rng.random()),           # k == n
    (10, 30, lambda rng, i: rng.random()),           # k > n
    (45, 4, lambda rng, i: None if i % 7 == 0 else rng.random()),  # NULLs sort last
]


@pytest.mark.parametrize("n,k,gen", CASES, ids=[f"n{n}_k{k}" for n, k, _ in CASES])
def test_global_ntile_matches_single_window(spark, n, k, gen):
    rng = random.Random(1000 + n * 31 + k)
    rows = [(i, gen(rng, i)) for i in range(n)]
    _compare(spark, rows, k)


def test_global_ntile_ascending_and_random_sweep(spark):
    """Randomized sweep (fixed seed): both directions, many (n, k) shapes in
    one pass — the hypothesis-style volume without per-example Spark jobs."""
    rng = random.Random(42)
    for trial in range(8):
        n = rng.randint(2, 80)
        k = rng.randint(1, 10)
        dup_pool = rng.randint(1, 6)  # small pool => many boundary ties
        rows = [
            (i, None if rng.random() < 0.1 else float(rng.randint(0, dup_pool)))
            for i in range(n)
        ]
        _compare(spark, rows, k, descending=bool(trial % 2))


def test_global_ntile_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, 1.0)], "id LONG, v DOUBLE")
    with pytest.raises(ValueError, match="k must be >= 1"):
        global_ntile(df, 0, "v", "id")


def test_join_asof_tolerance_boundary_and_tie_alignment(spark, tmp_path):
    """Adversarial fixture for join_asof_tolerance's cross-engine contract
    (review finding r5): the sf testdata happens to contain no click within
    microseconds of the 1h staleness boundary and no click/purchase pair
    sharing a millisecond, so the oracle sweep cannot catch a precision
    divergence. This builds exactly those rows and checks Spark == DuckDB:

    - click whose MICROSECOND age is 1h + 800us but whose ms-truncated
      timestamp sits exactly on the cutoff: IN on both engines (the ms
      clock governs; a full-precision Spark side would null it while the
      epoch_ms oracle kept it — the exact divergence the fix removed);
    - click sharing the purchase's millisecond with a LARGER event_id:
      matched on both engines (clicks sort before purchases at equal ms);
    - click 1h + 2ms older: OUT on both engines."""
    import duckdb
    import pandas as pd

    from dumpr_spark.queries import REGISTRY

    base = pd.Timestamp("2026-01-01 12:00:00")
    us = pd.Timedelta(microseconds=1)
    h = pd.Timedelta(hours=1)
    rows = [
        # us-age = 1h + 800us (out by the us clock), ms-truncated click =
        # 11:00:00.000 = exactly purchase_ms - 1h (in by the ms clock)
        (1, base - h + 100 * us, 10, "click", 1.0, None),
        (2, base + 900 * us, 10, "purchase", 1.0, None),
        # same-ms tie, click has the larger event_id
        (40, base, 20, "purchase", 1.0, None),
        (41, base + 200 * us, 20, "click", 1.0, None),
        # clearly stale: click at purchase - 1h - 2ms
        (5, base - h - pd.Timedelta(milliseconds=2), 30, "click", 1.0, None),
        (6, base, 30, "purchase", 1.0, None),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    con = duckdb.connect()
    con.register("pdf", pdf)
    con.sql(f"COPY (SELECT * FROM pdf) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)")

    q = REGISTRY["join_asof_tolerance"]
    got = {
        (r["user_id"], r["event_id"]): r["click_ms_within_1h"]
        for r in q.fn(spark, str(tmp_path)).collect()
    }
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    want = {
        (r[0], r[1]): r[2] for r in con.sql(q.oracle).fetchall()
    }
    assert got == want
    # and the semantic expectations themselves:
    assert got[(10, 2)] is not None      # boundary click IN at ms precision
    assert got[(20, 40)] is not None     # same-ms click matched despite id order
    assert got[(30, 6)] is None          # 1h+2ms-stale click nulled


def test_events_autocorr_chunked_equals_global_lag(spark, tmp_path):
    """The (event_type, week-chunk) + boundary-carry decomposition of
    events_autocorr must produce EXACTLY the pair set of the naive
    per-type global lag — including pairs that cross chunk edges and pairs
    that span EMPTY chunks (a type absent for whole weeks). Randomized
    multi-week fixture with deliberate gap weeks, compared against the
    single-window formulation on the same data."""
    import random

    import duckdb
    import pandas as pd

    from dumpr_spark.queries import REGISTRY

    rng = random.Random(42)
    base = pd.Timestamp("2026-01-05")
    rows = []
    eid = 0
    for etype, active_weeks in [
        ("alpha", [0, 1, 2, 5]),      # 2-week gap between chunks 2 and 5
        ("beta", [0, 4]),             # 3-week gap
        ("gamma", [3]),               # single chunk => boundary-free
    ]:
        for wk in active_weeks:
            for _ in range(rng.randint(3, 9)):
                eid += 1
                rows.append((
                    eid,
                    base + pd.Timedelta(days=7 * wk)
                    + pd.Timedelta(seconds=rng.randint(0, 6 * 86400)),
                    rng.randint(1, 5),
                    etype,
                    round(rng.uniform(-10, 10), 3),
                    None,
                ))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    con = duckdb.connect()
    con.register("pdf", pdf)
    con.sql(f"COPY (SELECT * FROM pdf) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)")

    got = {
        r["event_type"]: (r["n_pairs"], r["autocorr_lag1"])
        for r in REGISTRY["events_autocorr"].fn(spark, str(tmp_path)).collect()
    }
    # naive single-window reference on the same parquet
    from pyspark.sql import Window, functions as F

    from dumpr_spark.queries.base import eps_round, t as _t

    e = _t(spark, str(tmp_path), "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    naive = {
        r["event_type"]: (r["n_pairs"], r["autocorr_lag1"])
        for r in (
            e.select("event_type", "value", F.lag("value").over(w).alias("pv"))
            .where(F.col("pv").isNotNull())
            .groupBy("event_type")
            .agg(
                F.count("pv").cast("long").alias("n_pairs"),
                eps_round(F.corr("value", "pv"), 4).alias("autocorr_lag1"),
            )
            .collect()
        )
    }
    assert got == naive
    # sanity: every type pairs n_events - 1 times (gaps carried, not dropped)
    counts = pdf.groupby("event_type").size().to_dict()
    for etype, (n_pairs, _) in got.items():
        assert n_pairs == counts[etype] - 1
