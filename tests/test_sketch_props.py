"""Property tests for the mergeable fixed-bin histogram sketch
(dumpr_spark.functions.sketches) against a pure-Python reference — the
edge cases one oracle query at one distribution cannot pin: exact bin-edge
values, q*n landing exactly on a cumulative boundary, clamped out-of-range
values (both ends), single-row groups, all-equal values, n < bins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumpr_spark.functions import sketches as sk
from tests.sketch_ref import ref_quantile as _ref_quantile

W, NBINS = 5.0, 100





CASES = [
    ("single", [7.3]),
    ("all_equal", [10.0] * 9),
    ("bin_edges", [0.0, 5.0, 5.0, 10.0, 15.0, 15.0]),          # values exactly on edges
    ("exact_boundary", [1.0] * 5 + [11.0] * 5),                 # q*n == cum at q=0.5
    ("clamped_high", [3.0, 4.0, 600.0, 9999.0]),                # above-range -> bin 99
    ("clamped_negative", [-12.0, -0.5, 2.0, 3.0]),              # below-range -> bin 0
    ("sparse_tail", [1.0] * 20 + [480.0]),                      # empty middle bins
    ("n_lt_bins", [float(i) for i in range(7)]),
]


@pytest.mark.parametrize("name,values", CASES, ids=[c[0] for c in CASES])
def test_histogram_quantiles_match_reference(spark, name, values):
    df = spark.createDataFrame([("g", v) for v in values], "g STRING, value DOUBLE")
    bins = sk.histogram_bins(df, "value", ["g"], bin_width=W, n_bins=NBINS)
    got = {
        r["q"]: r["est"]
        for r in sk.histogram_quantiles(bins, [0.25, 0.5, 0.95], ["g"], bin_width=W).collect()
    }
    for q in (0.25, 0.5, 0.95):
        expected = _ref_quantile(values, q)
        assert got[q] == pytest.approx(expected, abs=1e-9), (name, q)


@pytest.mark.parametrize("name,values", CASES, ids=[c[0] for c in CASES])
def test_estimate_lies_in_crossing_bin(spark, name, values):
    """The structural guarantee: the estimate sits inside the bin holding
    the ceil(q*n)-th order statistic (its clamped bin), for every q."""
    df = spark.createDataFrame([("g", v) for v in values], "g STRING, value DOUBLE")
    bins = sk.histogram_bins(df, "value", ["g"], bin_width=W, n_bins=NBINS)
    import math

    for r in sk.histogram_quantiles(bins, [0.25, 0.5, 0.95], ["g"], bin_width=W).collect():
        j = max(1, math.ceil(r["q"] * len(values)))
        os_j = sorted(values)[j - 1]
        b = min(max(int(os_j // W), 0), NBINS - 1)
        assert b * W <= r["est"] <= (b + 1) * W, (name, r["q"], r["est"], b)


def test_merge_partials_equals_single_build(spark):
    """Lossless merge over an arbitrary partition of the input: bins built
    per partial key and merged == bins built in one pass."""
    values = [(f"g{i % 3}", i % 5, float((i * 37) % 513) - 6.0) for i in range(400)]
    df = spark.createDataFrame(values, "g STRING, part INT, value DOUBLE")
    partials = sk.histogram_bins(df, "value", ["g"], extra_keys=[F.col("part")])
    merged = sk.merge_bins(partials, ["g"])
    direct = sk.histogram_bins(df, "value", ["g"])
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_null_values_are_excluded_not_top_binned(spark):
    """NULLs must not be measurements: Spark's least/greatest skip NULLs,
    so an unguarded clamp would file every NULL into the TOP bin
    (least(NULL, 99) = 99) and inflate p95. bin_index returns NULL for
    NULL input and histogram_bins drops it — the quantiles of
    [1, 2, NULL] must equal the quantiles of [1, 2]."""
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", None)], "g STRING, value DOUBLE"
    )
    bins = sk.histogram_bins(df, "value", ["g"], bin_width=W, n_bins=NBINS)
    rows = {r["bin"]: r["c"] for r in bins.collect()}
    assert rows == {0: 2}  # nothing in bin 99, no NULL-bin row
    got = {
        r["q"]: r["est"]
        for r in sk.histogram_quantiles(bins, [0.95], ["g"], bin_width=W).collect()
    }
    assert got[0.95] == _ref_quantile([1.0, 2.0], 0.95)
