#!/usr/bin/env python
"""Materialize a synthetic embeddings corpus AT the sampling rule's own
engagement point (r13 verdict item 5): `_ivfpq_train_sample_mod` engages
only at mod = n // max(5000, 100*cells) >= 4, which at derived cells
(round(sqrt(n))) means n >= 160,000 — beyond both the shipped testdata
(2k at sf0.1) and the rotated-copy trick (copies stay distinct only up
to dim=64, i.e. 128k). The r13 recall clauses were therefore scored at
FORCED dials (mod=2 at 80k / an out-of-domain mod=4 at 20k) — both
MISSes diagnose the probe, not the rule. This corpus lets the rule
engage on its own terms.

Construction (deterministic, seedless — xxhash64 arithmetic only, the
repo's standing discipline): n vectors, dim=64, a mixture of `centers`
soft clusters — component j of vector i is

    base(c, j) + noise_scale * u(i, j),   c = i mod centers

with base/u independent uniforms in [-1, 1] derived from xxhash64, so
the corpus has real cluster structure for IVF to find (a pure-uniform
cloud makes recall@5 a coin flip for ANY index and would trivialize the
delta) while noise_scale=0.5 keeps clusters overlapping enough that
cell geometry matters. Schema matches the testdata embeddings table
(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT = the cluster id).

Usage: python scripts/make_ann_engage_corpus.py [n] [out_dir]
  default n=250000 (cells=500, budget=50k, mod=5 — engaged), out_dir
  /tmp/ann_engage. Writes <out_dir>/embeddings.parquet.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from dumpr_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_engage"
    centers = 200
    noise = 0.5
    dim = 64

    spark = get_spark("make_ann_engage_corpus")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(f"cast(pmod(id, {centers}) as int)").alias("label"),
    ).withColumn(
        "embedding",
        F.expr(
            f"transform(sequence(1, {dim}), j -> cast("
            f"((pmod(xxhash64('c', cast(label as bigint), j), 2001) / 1000.0) - 1.0) "
            f"+ {noise} * ((pmod(xxhash64('n', vec_id, j), 2001) / 1000.0) - 1.0) "
            f"as float))"
        ),
    ).select("vec_id", "embedding", "label")
    os.makedirs(out, exist_ok=True)
    df.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    print(f"wrote {n} vectors (centers={centers}, noise={noise}) to "
          f"{out}/embeddings.parquet")


if __name__ == "__main__":
    main()
