#!/usr/bin/env python
"""Print the sim_ivfpq_recall dial-sweep rows at a given sf_dir (Spark side
only) — the measurement behind the r10 scaling-rule docstring.

Usage: python scripts/ivfpq_dial_probe.py [sf_dir]
"""
import sys

sys.path.insert(0, "/root/repo")

from dumpr_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    from dumpr_spark.queries import REGISTRY

    df = REGISTRY["sim_ivfpq_recall"].fn(spark, sf_dir)
    for r in df.collect():
        print(f"{r['method']:12s} nprobe={r['dial']} hits={r['hits']:4d} "
              f"n_exact={r['n_exact']} recall={r['recall']}")


if __name__ == "__main__":
    main()
