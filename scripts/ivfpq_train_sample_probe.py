#!/usr/bin/env python
"""Measure the IVF-PQ trainer's at-volume sampling dial: train cost and
recall@5 when the trainers read only a deterministic hash sample of the
corpus (train_sample_mod — since r13 it bounds BOTH the coarse Lloyd and
the PQ codebook rounds), across cell counts. The claims under test:

 (r10, PQ side) a 16-codeword-per-subspace codebook saturates on a sample,
 so the 100 TB trainer never needs the full scan;
 (r13, coarse side — the r12 train-cost MISS's named cause) coarse Lloyd
 assignment is O(n_train x cells x dim), so at the derived cells ~ sqrt(n)
 the SAMPLED trainer is what keeps the sqrt-cells build inside the
 committed train-cost bound, at (committed) negligible recall loss vs the
 full-corpus trainer at the same dial.

Seeds are forced into the sample on both trainers, so the seeded starting
point is identical to the full trainer's at every mod.

Usage: python scripts/ivfpq_train_sample_probe.py [sf_dir] [cells ...]
  default sf_dir = /root/testdata/sf0.1; default cells = 8 and the derived
  round(sqrt(n)). Each cell count is built at mod=None (full trainer) and
  at the absolute-budget mod (n // 5000 — the r10-measured noise-flat
  sample of ~5k training vectors), then served at the registered dial
  (nprobe=4, derived shortlist) plus the r12 probe's scaled-nprobe leg.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from dumpr_spark.functions import similarity as sim
    from dumpr_spark.queries.base import t
    from dumpr_spark.queries.llm import (
        _ivfpq_derive_cells, _ivfpq_index, _ivfpq_query,
        _ivfpq_serve_shortlist,
    )
    from dumpr_spark.session import get_spark

    spark = get_spark("ivfpq_train_sample")
    spark.sparkContext.setLogLevel("ERROR")

    e = t(spark, sf_dir, "embeddings")
    n = e.count()
    cells_list = (
        [int(a) for a in sys.argv[2:]]
        if len(sys.argv) > 2
        else [8, _ivfpq_derive_cells(n)]
    )
    budget_mod = max(1, n // 5000)  # ~5k training vectors (r10 dial table)

    q = e.where(F.col("vec_id") < 32)
    exact = (
        sim.brute_force_topk(e, q, k=5, round_eps=1e-9)
        .select("q_id", "n_id")
        .localCheckpoint(eager=False)
    )
    tot = exact.count()
    print(f"corpus n={n}  budget mod={budget_mod} "
          f"(~{n // budget_mod} training vectors)  exact pairs={tot}")
    print(f"{'cells':>6} {'mod':>5} {'train_s':>8} {'nprobe':>6} "
          f"{'shortlist':>9} {'recall@5':>9} {'serve_s':>8}")

    for cells in cells_list:
        sl = _ivfpq_serve_shortlist(n, cells=cells)
        for mod in (None, budget_mod):
            t0 = time.monotonic()
            index = _ivfpq_index(spark, sf_dir, train_sample_mod=mod,
                                 cells=cells)
            index[5].count()  # force coarse Lloyd + PQ train + encode
            train_s = time.monotonic() - t0
            legs = sorted({4, max(1, round(cells / 8))})
            for nprobe in legs:
                if nprobe > cells:
                    continue
                t1 = time.monotonic()
                hits = (
                    _ivfpq_query(*index, nprobe=nprobe, shortlist=sl)
                    .where(F.col("rank") <= 5).select("q_id", "n_id")
                    .join(exact, ["q_id", "n_id"]).count()
                )
                serve_s = time.monotonic() - t1
                print(f"{cells:>6} {str(mod):>5} {train_s:>8.2f} "
                      f"{nprobe:>6} {sl:>9} {hits / tot:>9.4f} "
                      f"{serve_s:>8.2f}")
                train_s = float("nan")  # printed once per build


if __name__ == "__main__":
    main()
