#!/usr/bin/env python
"""Measure the IVF-PQ trainer's at-volume sampling dial: recall@5 when the
PQ Lloyd rounds read only a deterministic hash sample of the corpus
residuals (train_sample_mod), at the default serving dial (nprobe=2,
shortlist=32) and the recovered one (4, 128). The claim under test: a
16-codeword-per-subspace codebook saturates on a sample, so the 100 TB
trainer never needs the full scan.

Usage: python scripts/ivfpq_train_sample_probe.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from dumpr_spark.functions import similarity as sim
    from dumpr_spark.queries.llm import _ivfpq_index, _ivfpq_query
    from dumpr_spark.session import get_spark

    spark = get_spark("ivfpq_train_sample")
    spark.sparkContext.setLogLevel("ERROR")

    for mod in (None, 2, 4):
        e, q, cdf, cents, cb, vcode = _ivfpq_index(
            spark, sf_dir, train_sample_mod=mod
        )
        exact = (
            sim.brute_force_topk(e, q, k=5, round_eps=1e-9)
            .select("q_id", "n_id")
            .localCheckpoint(eager=False)
        )
        tot = exact.count()
        for np_, sl in ((2, 32), (4, 128)):
            hits = (
                _ivfpq_query(e, q, cdf, cents, cb, vcode,
                             nprobe=np_, shortlist=sl)
                .where(F.col("rank") <= 5)
                .select("q_id", "n_id")
                .join(exact, ["q_id", "n_id"])
                .count()
            )
            print(f"train_sample_mod={str(mod):4s} dial=({np_},{sl:3d}) "
                  f"recall@5={hits / tot:.4f}")


if __name__ == "__main__":
    main()
