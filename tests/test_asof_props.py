"""Property tests for operators/asof.asof_join against a pure-Python
reference — the r5 review's landmine class: ms-vs-µs precision, equal-
timestamp ties (left==right AND right==right), NULL right-times, and
tolerance boundaries are exactly the cases a single fixture query cannot
pin. The reference replays the documented contract directly: latest right
with right_time <= left_time per key, inclusive tolerance
(right_time >= left_time - tol), max-(time, payload-tuple) tie-break.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F  # noqa: F401  (schema helpers)

from dumpr_spark.operators.asof import asof_join

EPOCH = datetime(2026, 1, 1, tzinfo=None)

# sub-second components chosen to sit ON and NEXT TO rounding boundaries:
# a µs-vs-ms truncation bug shifts 999999/500000/1 but not 0
_MICROS = [0, 1, 499999, 500000, 999999]


def _gen(rng: random.Random, n_left: int, n_right: int, null_every: int):
    def ts():
        return EPOCH + timedelta(
            seconds=rng.randint(0, 5), microseconds=rng.choice(_MICROS)
        )

    lefts = [
        (rng.randint(0, 2), ts(), float(i)) for i in range(n_left)
    ]
    rights = [
        (
            rng.randint(0, 2),
            None if null_every and i % null_every == 0 else ts(),
            float(rng.randint(0, 3)),  # small range -> payload ties too
        )
        for i in range(n_right)
    ]
    return lefts, rights


def _py_reference(lefts, rights, tol: timedelta | None):
    out = {}
    for k, lt, qty in lefts:
        cands = [
            (rt, px)
            for rk, rt, px in rights
            if rk == k
            and rt is not None
            and rt <= lt
            and (tol is None or rt >= lt - tol)
        ]
        # window order is (_t asc, _r struct asc) with last-value carry: the
        # max (time, payload..., time) tuple wins — payload tuple breaks ties
        out[(k, lt, qty)] = max(cands)[1] if cands else None
    return out


CASES = [
    # (seed, n_left, n_right, null_every, tolerance_str, tolerance_td)
    (1, 30, 30, 0, None, None),
    (2, 40, 25, 5, None, None),                      # NULL right-times
    (3, 35, 35, 0, "1 SECOND", timedelta(seconds=1)),
    (4, 50, 40, 7, "500 MILLISECOND", timedelta(milliseconds=500)),
    (5, 25, 50, 0, "1 MICROSECOND", timedelta(microseconds=1)),  # knife edge
    (6, 40, 1, 0, "2 SECOND", timedelta(seconds=2)),  # single right row
    (7, 30, 30, 2, "750 MILLISECOND", timedelta(milliseconds=750)),
]


@pytest.mark.parametrize(
    "seed,nl,nr,nul,tol_s,tol_td",
    CASES,
    ids=[f"seed{c[0]}_tol{c[4]}" for c in CASES],
)
def test_asof_join_tolerance_matches_python_reference(
    spark, seed, nl, nr, nul, tol_s, tol_td
):
    rng = random.Random(seed)
    lefts, rights = _gen(rng, nl, nr, nul)
    ldf = spark.createDataFrame(lefts, "k int, t timestamp, qty double")
    rdf = spark.createDataFrame(rights, "k int, rt timestamp, px double")
    got = {
        (r["k"], r["t"], r["qty"]): r["px"]
        for r in asof_join(
            ldf, rdf, "k", "t", "rt", right_cols=["px"], tolerance=tol_s
        ).collect()
    }
    want = _py_reference(lefts, rights, tol_td)
    assert got == want, {
        kk: (got[kk], want[kk]) for kk in want if got.get(kk) != want[kk]
    }


def test_asof_join_exact_boundary_inclusive(spark):
    """The inclusive edges pinned exactly: a right row at left_time - tol
    matches (>=), one microsecond older does not; a right row at exactly
    left_time matches (<=)."""
    lt = EPOCH + timedelta(seconds=3)
    ldf = spark.createDataFrame([(1, lt, 1.0)], "k int, t timestamp, qty double")
    tol = timedelta(seconds=1)
    for rt, expect in [
        (lt, 10.0),                                   # exact left_time
        (lt - tol, 20.0),                             # exactly at tolerance
        (lt - tol - timedelta(microseconds=1), None),  # 1µs past: stale
    ]:
        rdf = spark.createDataFrame([(1, rt, 10.0 if expect == 10.0 else 20.0)],
                                    "k int, rt timestamp, px double")
        row = asof_join(ldf, rdf, "k", "t", "rt", right_cols=["px"],
                        tolerance="1 SECOND").collect()[0]
        assert row["px"] == expect, (rt, row["px"], expect)


def _nearest_reference(lefts, rights, tol=None):
    """Pure-Python replay of asof_join_nearest's documented contract:
    min |dt|, backward preferred on |dt| ties, max (payload..., time)
    struct among rows tied on the winning side+timestamp; tolerance
    bounds |dt| inclusively on both sides."""
    out = {}
    for k, lt, qty in lefts:
        best = None
        for rk, rt, px in rights:
            if rk != k or rt is None:
                continue
            dt = (lt - rt).total_seconds()
            adt = abs(dt)
            if tol is not None and adt > tol.total_seconds():
                continue
            # rank: (|dt|, forward?, -payload-struct) minimized
            cand = (adt, 0 if dt >= 0 else 1, tuple(-x for x in ((px,) + (rt.timestamp(),))))
            if best is None or cand < best[0]:
                best = (cand, px)
        out[(k, lt, qty)] = None if best is None else best[1]
    return out


@pytest.mark.parametrize("seed,tol", [(11, None), (12, None), (13, 2)])
def test_asof_join_nearest_matches_python_reference(spark, seed, tol):
    """Randomized contract replay for direction='nearest': equal-timestamp
    ties on both sides, payload ties, NULL right-times, forward-only and
    backward-only keys, and inclusive tolerance on BOTH sides."""
    from dumpr_spark.operators.asof import asof_join_nearest

    rng = random.Random(seed)
    lefts, rights = _gen(rng, 60, 80, null_every=7)
    tol_td = timedelta(seconds=tol) if tol else None
    expect = _nearest_reference(lefts, rights, tol_td)

    ldf = spark.createDataFrame(lefts, "k int, t timestamp, qty double")
    rdf = spark.createDataFrame(rights, "k int, rt timestamp, px double")
    got = asof_join_nearest(
        ldf, rdf, "k", "t", "rt", right_cols=["px"],
        tolerance=f"{tol} SECONDS" if tol else None,
    ).collect()
    assert len(got) == len(lefts)
    for r in got:
        key = (r["k"], r["t"], r["qty"])
        assert r["px"] == expect[key], (key, r["px"], expect[key])


def test_asof_join_nearest_matches_pandas_merge_asof(spark):
    """External validation on tie-free data: pandas merge_asof
    direction='nearest' must agree wherever no |dt| tie exists (the tie
    rule is the only place the contracts could diverge)."""
    import pandas as pd

    from dumpr_spark.operators.asof import asof_join_nearest

    rng = random.Random(99)
    # odd-second lefts, even-second rights -> |dt| ties impossible within
    # a key only if right times are distinct; force distinct right times
    lefts = [(k, EPOCH + timedelta(seconds=2 * i + 1), float(i))
             for i, k in enumerate(rng.choices([0, 1], k=30))]
    rights = [(k, EPOCH + timedelta(seconds=2 * i), float(100 + i))
              for i, k in enumerate(rng.choices([0, 1], k=40))]
    ldf = spark.createDataFrame(lefts, "k int, t timestamp, qty double")
    rdf = spark.createDataFrame(rights, "k int, rt timestamp, px double")
    got = {
        (r["k"], r["t"]): r["px"]
        for r in asof_join_nearest(ldf, rdf, "k", "t", "rt",
                                   right_cols=["px"]).collect()
    }
    lp = pd.DataFrame(lefts, columns=["k", "t", "qty"]).sort_values("t")
    rp = pd.DataFrame(rights, columns=["k", "rt", "px"]).sort_values("rt")
    ref = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k",
                        direction="nearest")
    for _, row in ref.iterrows():
        want = None if pd.isna(row["px"]) else row["px"]
        assert got[(row["k"], row["t"].to_pydatetime())] == want
