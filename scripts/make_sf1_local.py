#!/usr/bin/env python
"""Materialize a LOCAL ~sf1 dataset (10x sf0.1) for the scaling exercise the
round-7 verdict asked for: the driver ships no sf1 testdata, but SCALE.md
commits a falsifiable sf1 expectation for the headline bench, so this script
manufactures the 10x input that lets us MEASURE the continuation instead of
asserting it.

Construction: each table is 10 key-shifted copies of its sf0.1 parquet,
written under <repo>/.sf1_local (gitignored). The shift constant 231_000_000
is a multiple of lcm(2,3,5,7,10,11) = 2310 (and of 10), so every modulus the
synthetic CDC/dup-corpus derivations take (%5 updates, %7 deletes, %10 twins,
%3/%11 epochs) sees the same residue classes in every copy — the derived
workloads scale by exactly 10x in rows with unchanged selectivities. Join
keys shift consistently on both sides (orders.o_custkey with customer
.c_custkey), so join fan-outs keep their sf0.1 shape. Types are normalized
by reading through the engine loader (events' TIMESTAMP(NANOS) becomes the
usual TIMESTAMP_NTZ before the copy is written).

Usage: python scripts/make_sf1_local.py [out_dir]
  SF_LOCAL_COPIES=N          override the copy count (default 10; embedding
                             rotations stay distinct up to dim=64 copies)
  SF_LOCAL_EMBEDDINGS_ONLY=1 write only the rotated embeddings table (the
                             ANN probes' corpus — skips the 5 TPC-H tables)
Then:  python scripts/scaling_curve_sf1.py   (measure predicted vs actual)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHIFT = 231_000_000
COPIES = int(os.environ.get("SF_LOCAL_COPIES", "10"))
# the five shuffle-bearing headline queries' inputs + the warmup table
TABLES = {
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}


def main(out_dir: str) -> None:
    from pyspark.sql import functions as F

    from dumpr_spark.queries.base import t
    from dumpr_spark.session import get_spark

    spark = get_spark("make_sf1_local")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    tables = {} if os.environ.get("SF_LOCAL_EMBEDDINGS_ONLY") else TABLES
    for name, keys in tables.items():
        base = t(spark, sf_dir, name)
        parts = []
        for i in range(COPIES):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        dest = os.path.join(out_dir, f"{name}.parquet")
        out.write.mode("overwrite").parquet(dest)
        print(f"{name}: {base.count()} -> {spark.read.parquet(dest).count()} rows")

    # embeddings (r12, the ANN cells ~ sqrt(n) exercise): a plain key-shift
    # copy would duplicate every VECTOR 10x, which degenerates any recall
    # measurement (ground-truth top-k becomes the copies of self). Instead
    # each copy's vectors are circularly ROTATED by the copy index —
    # deterministic, norm- and pairwise-geometry-preserving within a copy,
    # and distinct across copies — so the 10x corpus keeps sf0.1-like
    # cluster structure while every vector is unique. Copy 0 is the
    # original, so the vec_id < 32 query set is unchanged.
    base = t(spark, sf_dir, "embeddings")
    dim = len(base.select("embedding").first()["embedding"])
    parts = []
    for i in range(COPIES):
        rot = i % dim
        df = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
        if rot:
            df = df.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), rot + 1, dim - rot),
                    F.slice(F.col("embedding"), 1, rot),
                ),
            )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    dest = os.path.join(out_dir, "embeddings.parquet")
    out.write.mode("overwrite").parquet(dest)
    print(f"embeddings: {base.count()} -> {spark.read.parquet(dest).count()} "
          f"rows (dim={dim}, rotated copies)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".sf1_local"))
