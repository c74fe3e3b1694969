#!/usr/bin/env python
"""Measure `migrate_key_bucket` at volume (r15 verdict item 5: the
sanctioned layout-change path is parity-tested at test scale only; its
O(state) full rewrite had no at-volume number — the one sink lifecycle
step still unmeasured after seed/trickle/compact/growth were).

Three sanctioned directions over the SAME state rows, timed:

1. plain -> bucketed (the "adopt the certified layout" migration the
   growth warning points at): policy derived from the state itself via
   `derive_auto_policy` (the exact object `suggest_migration` would
   return on this uniform domain), exactly as the docstring prescribes.
2. bucketed -> re-bucketed (a CHANGED range policy — 4x coarser width,
   the "re-derived policy after growth" shape).
3. bucketed -> plain (the exit path).

Each migration is one full read + one partitioned rewrite + marker stamp
+ two-rename swap — O(state) by design ("the honest price of a layout
change"). Determinism: ids are pure arithmetic; the live-state checksum
(count + xxhash64 fold over id/content/seq) must be IDENTICAL after
every step (asserted in-run, the trickle harness's parity discipline).

Cost model the prediction commits to (SCALE.md r16): a migration should
cost about one seed write of the TARGET layout (same write shape; the
read side is a full scan either way), so wall ~ 0.75-1.5x the measured
plain seed wall, with bucketed-source directions paying the extra
O(4096)-dir listing measured at ~7 s worst case in SCALE.md r12.

Usage: python scripts/migrate_volume.py [state_rows]
Prints one JSON line with per-direction wall seconds + file counts.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from dumpr_spark.session import get_spark
    from dumpr_spark.streaming.sink import (
        KeyBucket, MergeSink, derive_auto_policy, migrate_key_bucket,
    )

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    spark = get_spark("migrate_volume")
    spark.sparkContext.setLogLevel("ERROR")
    work = "/tmp/migrate_volume"
    shutil.rmtree(work, ignore_errors=True)
    state = os.path.join(work, "state")

    def env(ids_df, seq_base):
        return ids_df.select(
            F.lit("upsert").alias("op"),
            F.lit("orders").alias("tbl"),
            F.col("k").cast("string").alias("id"),
            F.to_json(F.struct(F.col("k"), (F.col("k") % 97).alias("v")))
                .alias("content"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit("f1").alias("next_file"),
            F.lit(None).cast("long").alias("next_position"),
            (F.col("k") + F.lit(seq_base)).cast("long").alias("seq"),
        )

    def checksum(key_bucket):
        live = MergeSink(spark, state, key_bucket=key_bucket).read_state()
        row = live.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("id", "content", "seq")
                  .cast("decimal(38,0)")).cast("string").alias("h"),
        ).collect()[0]
        return (int(row["n"]), row["h"])

    def census(path):
        files = dirs = 0
        for _root, ds, fs in os.walk(path):
            dirs += len(ds)
            files += sum(1 for f in fs if not f.startswith(("_", ".")))
        return {"files": files, "dirs": dirs}

    # seed a PLAIN state (the baseline every direction's cost compares to)
    t0 = time.monotonic()
    plain = MergeSink(spark, state)
    plain(env(spark.range(n_rows).select(F.col("id").alias("k")), 0), 0)
    seed_s = round(time.monotonic() - t0, 1)
    want = checksum(None)

    # the policy a maintenance call would hand us on this state
    pol = derive_auto_policy(
        spark.read.parquet(state).select("id"))
    assert isinstance(pol, KeyBucket), pol

    out = {"metric": "migrate_key_bucket_volume", "state_rows": n_rows,
           "plain_seed_s": seed_s, "policy": pol.kb_identity(),
           "checksum_parity": True}

    steps = [
        ("plain_to_bucketed", pol, pol),
        ("rebucket_4x_coarser", KeyBucket(width=pol.width * 4,
                                          origin=pol.origin),
         KeyBucket(width=pol.width * 4, origin=pol.origin)),
        ("bucketed_to_plain", None, None),
    ]
    for name, target, read_kb in steps:
        t0 = time.monotonic()
        migrate_key_bucket(spark, state, target)
        wall = round(time.monotonic() - t0, 1)
        got = checksum(read_kb)
        assert got == want, f"{name}: checksum drifted {got} != {want}"
        out[name] = {"wall_s": wall, "x_seed": round(wall / seed_s, 2),
                     **census(state)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
