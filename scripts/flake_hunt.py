#!/usr/bin/env python
"""Flake hunt: run the full oracle sweep N times in ONE session and report
any query that is not green in EVERY run.

Why this exists: a parallel double aggregate's last ulp varies with shuffle
ARRIVAL order — across runs of the same code on the same data — and a hard
decision downstream (CASE class edge, argmax pick) amplifies that ulp into
whole rows (SCALE.md "order-sensitive-aggregate flake class"; found live in
r7 when agg_pareto_abc mismatched in one sweep of five and was green on
re-run). A single green sweep therefore proves less than it appears to;
this harness makes the repetition discipline one command.

Usage: python scripts/flake_hunt.py [sf_dir] [n_runs]
Exit code 1 if any query failed any run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str, n_runs: int) -> int:
    import duckdb

    from dumpr_spark.queries import REGISTRY
    from dumpr_spark.session import get_spark
    from scripts.check_oracle import check_one, register_views

    spark = get_spark("flake_hunt")
    spark.sparkContext.setLogLevel("ERROR")

    failures: dict[str, list[int]] = {}
    for run in range(1, n_runs + 1):
        con = duckdb.connect()
        register_views(con, sf_dir)
        bad = []
        for name in REGISTRY:
            status, _detail = check_one(spark, con, sf_dir, name)
            if status == "fail":
                bad.append(name)
                failures.setdefault(name, []).append(run)
        print(f"run {run}/{n_runs}: {len(REGISTRY) - len(bad)} ok, "
              f"{len(bad)} FAILED{': ' + ', '.join(bad) if bad else ''}",
              flush=True)
        con.close()

    if failures:
        print("\nFLAKY/FAILING (query: runs that failed):")
        for name, runs in sorted(failures.items()):
            kind = "always" if len(runs) == n_runs else "FLAKY"
            print(f"  {name}: {runs} ({kind})")
        return 1
    print(f"\nall {len(REGISTRY)} queries green in every one of {n_runs} runs")
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sys.exit(main(sf, n))
