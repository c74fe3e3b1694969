#!/usr/bin/env python
"""Measure the IVF-PQ trainer's at-volume sampling dial, STAGE-SEPARATED:
a single build wall conflates the trainer (what train_sample_mod bounds)
with the unavoidable per-vector index-construction map — the O(n x cells)
full-corpus coarse assignment and the O(n x M x KC) encode — which is
sample-independent by design and scales out with executors. The r13 run 1
scored its train-cost clause against the conflated wall and MISSED; this
probe reports the stages so the clause can target what the dial governs:

  coarse_train_s  Lloyd over the (sampled) trainer input — O(n_train x
                  cells x dim) x iters, the k-dependent driver-iterated
                  stage the r12 MISS named
  corpus_assign_s full-corpus nearest-cell + residuals (O(n x cells))
  pq_train_s      per-subspace Lloyd rounds over the (sampled) residuals
  encode_s        full-corpus PQ codes (O(n x M x KC))

The sampling dial follows the shared rule `_ivfpq_train_sample_mod`
(budget = max(5000, 100 * cells) — the r13-corrected, cells-dependent
form; the flat-5k budget the r10 table suggested under-trains the coarse
quantizer at derived cells: 35 points/cell measured recall .7625 vs the
full trainer's .8812). Override with TRAIN_MOD=<int> to replay a
diagnostic dial (e.g. the r13 run-1 mod=4).

Usage: python scripts/ivfpq_train_sample_probe.py [sf_dir] [cells ...]
  default sf_dir = /root/testdata/sf0.1; default cells = 8 and the
  derived round(sqrt(n)). Each cell count builds at mod=None (full
  trainer) and at the rule's mod (skipped if the rule says None), and
  serves at the registered dial (nprobe=4, derived shortlist) plus the
  scaled-nprobe leg.
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
        _ivfpq_serve_shortlist, _ivfpq_train_sample_mod,
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
    mod_override = int(os.environ.get("TRAIN_MOD", "0")) or None

    q = e.where(F.col("vec_id") < 32)
    exact = (
        sim.brute_force_topk(e, q, k=5, round_eps=1e-9)
        .select("q_id", "n_id")
        .localCheckpoint(eager=False)
    )
    tot = exact.count()
    print(f"corpus n={n}  exact pairs={tot}  "
          f"mod override={mod_override or '(rule)'}")
    print(f"{'cells':>6} {'mod':>5} {'coarse':>7} {'assign':>7} "
          f"{'pq':>6} {'encode':>7} {'trainer':>8} {'total':>7} "
          f"{'nprobe':>6} {'sl':>5} {'recall@5':>9} {'serve_s':>8}")

    for cells in cells_list:
        sl = _ivfpq_serve_shortlist(n, cells=cells)
        rule_mod = mod_override or _ivfpq_train_sample_mod(n, cells)
        mods = [None] + ([rule_mod] if rule_mod else [])
        for mod in mods:
            st: dict = {}
            t0 = time.monotonic()
            index = _ivfpq_index(spark, sf_dir, train_sample_mod=mod,
                                 cells=cells, stage_timings=st)
            total_s = time.monotonic() - t0
            trainer_s = st["coarse_train_s"] + st["pq_train_s"]
            stage_cols = (f"{st['coarse_train_s']:>7.2f} "
                          f"{st['corpus_assign_s']:>7.2f} "
                          f"{st['pq_train_s']:>6.2f} "
                          f"{st['encode_s']:>7.2f} {trainer_s:>8.2f} "
                          f"{total_s:>7.2f}")
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
                print(f"{cells:>6} {str(mod):>5} {stage_cols} "
                      f"{nprobe:>6} {sl:>5} {hits / tot:>9.4f} "
                      f"{serve_s:>8.2f}")
                stage_cols = " ".join(
                    f"{'—':>{w}}" for w in (7, 7, 6, 7, 8, 7)
                )


if __name__ == "__main__":
    main()
