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
