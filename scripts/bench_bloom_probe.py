#!/usr/bin/env python
"""A/B the two bloom probes at sf0.1: literal-array (plan-inlined words,
whole-stage codegen) vs broadcast+Arrow (one broadcast per executor, numpy
bit tests). Same artifact family, row-identical decisions — this measures
the JVM->Arrow boundary tax and the plan-size tax so SCALE.md can state
when each tier wins. Usage: python scripts/bench_bloom_probe.py [sf_dir]."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dumpr_spark.operators.bloom import (  # noqa: E402
    bloom_semi_join,
    bloom_semi_join_arrow,
    build_bloom,
)
from dumpr_spark.session import get_spark  # noqa: E402
from dumpr_spark.sources.files import load_table  # noqa: E402


def timed(label, fn, reps=3):
    best = min(timeit(fn) for _ in range(reps))
    print(f"{label:>42}: {best:7.3f} s (min of {reps})")
    return best


def timeit(fn):
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main(sf_dir):
    spark = get_spark("bench_bloom", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.where(F.col("o_totalprice") > 200000).select(
        F.col("o_orderkey").alias("k")
    )
    n_keys = keys.count()
    n_left = li.count()  # also warms the scan/footers for every timed run
    print(f"sf_dir={sf_dir} left={n_left} keys={n_keys}")

    for m in (1 << 16, 1 << 20):
        bloom = build_bloom(keys, "k", m_bits=m, k=5)
        lit = timed(
            f"literal probe m=2^{m.bit_length()-1}",
            lambda: bloom_semi_join(li, bloom, "l_orderkey").count(),
        )
        arw = timed(
            f"arrow probe   m=2^{m.bit_length()-1}",
            lambda: bloom_semi_join_arrow(li, bloom, "l_orderkey").count(),
        )
        print(f"{'arrow/literal ratio':>42}: {arw / lit:7.2f}x")
    # the tier only the arrow probe can serve
    bloom = build_bloom(keys, "k", m_bits=1 << 24, k=5)
    timed("arrow probe   m=2^24 (past literal cap)",
          lambda: bloom_semi_join_arrow(li, bloom, "l_orderkey").count())


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
