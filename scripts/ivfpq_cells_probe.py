#!/usr/bin/env python
"""Exercise the IVF-PQ index at the at-volume coarse-cell rule (r11 verdict
item 2): every serving docstring since r8 states cells ~ sqrt(n), but every
measurement ran at the PINNED 8 cells. This probe builds the index at BOTH
cell counts on the same corpus — the registered 8 and round(sqrt(n)) — and
prints (cells, nprobe, shortlist, recall@5, train s, serve s) rows, serving
each index at the derived shortlist rule so the dial and the index agree.

What changes with k at fixed corpus: the coarse Lloyd trainer cost (k x dim
broadcast, k-cell shuffles), the per-cell occupancy (n/k vectors -> smaller
cells = tighter residuals = better PQ codes but fewer candidates per probe),
and the probed fraction (nprobe/k of the corpus at equal nprobe — so a
cells-up move at FIXED nprobe cuts the scanned share ~k-fold and recall
falls unless nprobe scales with it; the serve legs below sweep nprobe at
the scaled k to show where the recall returns).

Exact-replay discipline kept: the index build is the registered
`_ivfpq_index` (eps-rounded Lloyd, id tie-breaks, pivoted ADC sums) with
only `cells` passed — the parameterization is plan-byte-identical at the
default (diff-verified r12), so the registered rows are NOT evicted.

Usage: python scripts/ivfpq_cells_probe.py [sf_dir] [cells ...]
  default sf_dir = <repo>/.sf1_local (run scripts/make_sf1_local.py first),
  default cells  = 8 and round(sqrt(n)).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from dumpr_spark.functions import similarity as sim
    from dumpr_spark.queries.base import t
    from dumpr_spark.queries.llm import (
        _ivfpq_index, _ivfpq_query, _ivfpq_serve_shortlist,
    )
    from dumpr_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, ".sf1_local")
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"{sf_dir} missing — run scripts/make_sf1_local.py first")

    spark = get_spark("ivfpq_cells_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from dumpr_spark.queries.llm import _ivfpq_derive_cells

    e = t(spark, sf_dir, "embeddings")
    n = e.count()
    cells_list = (
        [int(a) for a in sys.argv[2:]]
        if len(sys.argv) > 2
        else [8, _ivfpq_derive_cells(n)]
    )

    # exact ground truth once, shared by every leg (same queries: the
    # registered vec_id < 32 set lives in copy 0, unchanged at sf1-local)
    q = e.where(F.col("vec_id") < 32)
    exact = (
        sim.brute_force_topk(e, q, k=5, round_eps=1e-9)
        .select("q_id", "n_id").localCheckpoint()
    )
    tot = exact.count()
    print(f"corpus n={n}  queries={q.count()}  exact top-5 pairs={tot}")
    print(f"{'cells':>6} {'nprobe':>6} {'shortlist':>9} {'recall@5':>9} "
          f"{'train_s':>8} {'serve_s':>8}")

    for cells in cells_list:
        t0 = time.monotonic()
        index = _ivfpq_index(spark, sf_dir, cells=cells)
        # force the build: the encoded corpus (vcode) is the index state —
        # counting it materializes coarse Lloyd + PQ train + encode
        index[5].count()
        train_s = time.monotonic() - t0
        sl = _ivfpq_serve_shortlist(n, cells=cells)
        # nprobe legs: the pinned serving nprobe, scaled-with-k legs, AND
        # the equal-fraction point itself — matching nprobe=4 at 8 cells'
        # probed fraction needs nprobe = cells/2 at the scaled k, so that
        # leg (r12 advice: the sweep previously only bracketed it from
        # below, capped at 16) shows where the recall fully returns
        legs = sorted({4, 8, 16, max(1, round(cells / 8)),
                       max(1, round(cells / 2))} | (
            {2} if cells <= 8 else set()
        ))
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
            print(f"{cells:>6} {nprobe:>6} {sl:>9} {hits / tot:>9.4f} "
                  f"{train_s:>8.2f} {serve_s:>8.2f}")
            train_s = float("nan")  # train cost printed once per index


if __name__ == "__main__":
    main()
