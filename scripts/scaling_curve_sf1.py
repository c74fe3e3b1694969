#!/usr/bin/env python
"""Measure the sf1 continuation SCALE.md predicts: run the five
shuffle-bearing headline queries at sf0.1 and at the local 10x dataset
(scripts/make_sf1_local.py), print measured sf1 time vs the power-law
expectation t(1) ~= t(0.1) * max(g, 1) with g = t(0.1)/t(0.01) — the exact
rule the round-7 SCALE.md section commits to. Any >1.5x miss needs a named
cause (that is the falsifiability contract).

Usage: python scripts/scaling_curve_sf1.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the five shuffle-bearing headliners SCALE.md's sf1 table predicts, plus
# dedup_lsh_scaled as the CONTROL for the dedup_minhash_lsh miss (the
# duplicate-heavy-safe form measured on the same 10x data)
HEADLINERS = [
    "dedup_lsh_scaled",  # control, not one of the five
    "cdc_materialize",
    "dedup_minhash_lsh",
    "stream_session_window",
    "text_quality",
    "win_topk_per_group",
]


def main() -> None:
    from dumpr_spark.queries import REGISTRY
    from dumpr_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = os.path.join(repo, ".sf1_local")
    if not os.path.isdir(sf1_dir):
        sys.exit("run scripts/make_sf1_local.py first")

    spark = get_spark("scaling_sf1")
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir, name):
        best = None
        for _ in range(2):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    out = {}
    for sf_dir, label in [("/root/testdata/sf0.01", "sf0.01"),
                          ("/root/testdata/sf0.1", "sf0.1"),
                          (sf1_dir, "sf1_local")]:
        # warm the session/page cache on this dir before timing
        REGISTRY["agg_global"].fn(
            spark, sf_dir if label != "sf1_local" or
            os.path.exists(os.path.join(sf_dir, "lineitem.parquet"))
            else "/root/testdata/sf0.1"
        ).write.format("noop").mode("overwrite").save()
        out[label] = {n: run(sf_dir, n) for n in HEADLINERS}
        print(json.dumps({"scale": label, **out[label]}), flush=True)

    print("\n| query | sf0.01 | sf0.1 | g | expected sf1 | measured | miss |")
    print("|---|---|---|---|---|---|---|")
    for n in HEADLINERS:
        t001, t01, t1 = out["sf0.01"][n], out["sf0.1"][n], out["sf1_local"][n]
        g = t01 / t001 if t001 else float("nan")
        exp = t01 * max(g, 1.0)
        miss = t1 / exp if exp else float("nan")
        print(f"| {n} | {t001} | {t01} | {g:.2f}x | {exp:.2f} | {t1} | {miss:.2f}x |")
    print(f"\nloadavg: {os.getloadavg()}")


if __name__ == "__main__":
    main()
