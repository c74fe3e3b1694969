#!/usr/bin/env python
"""Split join_bucketed_colocated's cost the way the r9 verdict asked:
LAYOUT (one-time bucketed write) vs the amortized READ-side bucketed SMJ
vs the plain shuffled join on raw parquet — the comparison that shows what
the layout actually buys per query once its one-time cost is sunk.

Runs at sf0.1 and, when present, the local 10x dataset.

Usage: python scripts/bench_bucketed_read.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def agg(joined):
    return (
        joined.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n_lines"),
             F.sum("cents").alias("revenue_cents"))
    )


def timed(df, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    from dumpr_spark.operators.scale import (
        dataset_fingerprint, ensure_bucketed_layout, explain_str,
    )
    from dumpr_spark.queries.base import t
    from dumpr_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = [("sf0.1", "/root/testdata/sf0.1")]
    sf1 = os.path.join(repo, ".sf1_local")
    if os.path.isdir(sf1):
        dirs.append(("sf1-local", sf1))

    spark = get_spark("bench_bucketed_read")
    spark.sparkContext.setLogLevel("ERROR")

    for label, d in dirs:
        li = t(spark, d, "lineitem").select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        )
        o = t(spark, d, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
        )
        import hashlib

        dsid = hashlib.md5(d.encode()).hexdigest()[:4]
        fp = dataset_fingerprint(os.path.join(d, "lineitem.parquet"),
                                 os.path.join(d, "orders.parquet"))

        t0 = time.time()
        li_tbl = ensure_bucketed_layout(spark, f"jbc_li_{dsid}", li,
                                        "l_orderkey", fp, num_buckets=8)
        o_tbl = ensure_bucketed_layout(spark, f"jbc_o_{dsid}", o,
                                       "l_orderkey", fp, num_buckets=8)
        layout_s = time.time() - t0

        bucketed = (
            spark.table(li_tbl).hint("merge").join(spark.table(o_tbl), "l_orderkey")
        )
        plan = explain_str(bucketed, "simple")
        assert "Exchange hashpartitioning" not in plan, plan
        read_s = timed(agg(bucketed))

        # plain shuffled SMJ on raw parquet (merge hint keeps the join
        # algorithm identical — the delta is purely the two exchanges)
        plain = li.hint("merge").join(o, "l_orderkey")
        pplan = explain_str(plain, "simple")
        assert "Exchange hashpartitioning" in pplan, pplan
        plain_s = timed(agg(plain))

        print(f"{label:9s} layout(once)={layout_s:6.2f}s  "
              f"bucketed-read={read_s:6.2f}s  plain-shuffled={plain_s:6.2f}s  "
              f"read-side saving={plain_s - read_s:5.2f}s "
              f"({plain_s / read_s:4.2f}x)")


if __name__ == "__main__":
    main()
