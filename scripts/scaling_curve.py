#!/usr/bin/env python
"""Scaling evidence: run the headline bench queries at every testdata scale
factor in ONE session and print a per-sf table. Near-linear totals across the
100x sf0.001 -> sf0.1 range indicate shuffle/partition strategies that hold as
data grows (the per-query floor is Catalyst planning + task dispatch, so tiny
scales are overhead-dominated and the ratio flattens upward)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main(queries=None):
    from dumpr_spark.queries import REGISTRY
    from dumpr_spark.session import get_spark

    names = list(queries) if queries else HEADLINE
    spark = get_spark("scaling_curve")
    spark.sparkContext.setLogLevel("ERROR")

    sfs = ["0.001", "0.01", "0.1"]
    totals = {}
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        REGISTRY["agg_global"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        per = {}
        for name in names:
            best = None
            for _ in range(2):
                t0 = time.time()
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            per[name] = round(best, 3)
        totals[sf] = {"total": round(sum(per.values()), 3), "queries": per}
        print(json.dumps({"sf": sf, **totals[sf]}))

    print("\n| sf | rows (lineitem) | headline total (s) | vs sf0.001 |")
    print("|---|---|---|---|")
    base = totals["0.001"]["total"]
    rows = {"0.001": "~6k", "0.01": "~60k", "0.1": "~600k"}
    for sf in sfs:
        print(f"| {sf} | {rows[sf]} | {totals[sf]['total']} | {totals[sf]['total'] / base:.2f}x |")


if __name__ == "__main__":
    # optional: pass registry names to curve a custom query set
    main(sys.argv[1:] or None)
