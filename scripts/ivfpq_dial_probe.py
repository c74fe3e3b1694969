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

    # the REGISTERED serving dial — cells and shortlist from the SHARED
    # rules (_ivfpq_derive_cells since r13, _ivfpq_serve_shortlist since
    # r11), so this row always certifies the dial the registered path
    # actually serves at
    from pyspark.sql import functions as F

    from dumpr_spark.functions import similarity as sim
    from dumpr_spark.queries.base import t
    from dumpr_spark.queries.llm import (
        _IVFPQ_SERVE_NPROBE, _ivfpq_derive_cells, _ivfpq_index,
        _ivfpq_query, _ivfpq_serve_shortlist,
    )

    n = t(spark, sf_dir, "embeddings").count()
    cells = _ivfpq_derive_cells(n)
    index = _ivfpq_index(spark, sf_dir, cells=cells)
    e, q = index[0], index[1]
    sl = _ivfpq_serve_shortlist(n, cells=cells)
    exact = sim.brute_force_topk(e, q, k=5, round_eps=1e-9).select("q_id", "n_id")
    tot = exact.count()
    hits = (
        _ivfpq_query(*index, nprobe=_IVFPQ_SERVE_NPROBE, shortlist=sl)
        .where(F.col("rank") <= 5).select("q_id", "n_id")
        .join(exact, ["q_id", "n_id"]).count()
    )
    print(f"{'serving':12s} nprobe={_IVFPQ_SERVE_NPROBE} hits={hits:4d} "
          f"n_exact={tot} recall={hits / tot:.4f}  "
          f"(derived cells={cells}, shortlist={sl}, n={n})")


if __name__ == "__main__":
    main()
