#!/usr/bin/env python
"""Interleaved min-of-N A/B for bench regressions (r2 VERDICT watch item).

Variants run ALTERNATING in one JVM so box-load noise hits both equally;
min-of-N is the steady-state comparator (same convention as bench.py).

Usage: python scripts/ab_bench.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def old_synthetic_changes(spark, sf_dir):
    """The r1 three-scan union-of-snapshot_to_changes formulation (pre-b15f733)."""
    from dumpr_spark.queries.base import t

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    k = F.col("o_orderkey")

    def env(df, op, content, ts, nfile, npos, seq):
        return df.select(
            op.alias("op"),
            F.lit("orders").alias("tbl"),
            k.cast("string").alias("id"),
            content.alias("content"),
            ts.alias("ts"),
            nfile.alias("next_file"),
            npos.alias("next_position"),
            seq.cast("long").alias("seq"),
        )

    null_ts = F.lit(None).cast("timestamp")
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    base = env(
        o, F.lit("upsert"),
        F.to_json(F.struct(k, F.col("o_totalprice"), F.col("o_orderstatus"))),
        null_ts, null_s, null_l, k * 3,
    )
    upd = env(
        o.where(k % 5 == 0), F.lit("upsert"),
        F.to_json(F.struct(k, (F.col("o_totalprice") * 2).alias("o_totalprice"),
                           F.col("o_orderstatus"))),
        null_ts, null_s, null_l, k * 3 + 1,
    )
    dele = env(
        o.where(k % 7 == 0), F.lit("delete"), null_s,
        F.lit("2024-01-01 00:00:00").cast("timestamp"),
        F.lit("binlog.000001"), (k * 3 + 2).cast("long"), k * 3 + 2,
    )
    return base.unionByName(upd).unionByName(dele)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from dumpr_spark.cdc.materialize import materialize
    from dumpr_spark.queries import REGISTRY
    from dumpr_spark.queries.cdc import _synthetic_changes
    from dumpr_spark.session import get_spark

    spark = get_spark("ab_bench")
    spark.sparkContext.setLogLevel("ERROR")

    variants = {
        "cdc_mat_OLD_3scan": lambda: materialize(old_synthetic_changes(spark, sf_dir)),
        "cdc_mat_NEW_explode": lambda: materialize(_synthetic_changes(spark, sf_dir)),
        "stream_tumbling_window": lambda: REGISTRY["stream_tumbling_window"].fn(spark, sf_dir),
    }
    # warm
    for fn in variants.values():
        fn().write.format("noop").mode("overwrite").save()

    best: dict[str, float] = {}
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(n):
        for name, fn in variants.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            best[name] = min(best.get(name, dt), dt)
    for name in variants:
        print(f"{name}: min={best[name]} samples={samples[name]}")


if __name__ == "__main__":
    main()
