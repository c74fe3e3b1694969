#!/usr/bin/env python
"""Re-run the r9 image-near-dup falsifiability row with the r10 scaled twin
beside the plain form: pair VOLUME at sf0.1 vs the local 10x dataset
(scripts/make_sf1_local.py). The r9 run measured the plain banding going
168 -> 99,330 pairs (591x at 10x docs — C(c,2) per identical-payload
group); the scaled twin's done-criterion is pair volume ~linear in unique
payloads (c-1 edges per group + rep-level band hits).

Usage: python scripts/ahash_scaled_volume.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from dumpr_spark.queries import REGISTRY
    from dumpr_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = os.path.join(repo, ".sf1_local")
    if not os.path.isdir(sf1_dir):
        sys.exit("run scripts/make_sf1_local.py first")

    spark = get_spark("ahash_volume")
    spark.sparkContext.setLogLevel("ERROR")

    for name in ("multimodal_ahash_neardup", "multimodal_ahash_neardup_scaled"):
        for label, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1-local", sf1_dir)):
            best_t, n = None, None
            for _ in range(2):
                t0 = time.time()
                n = REGISTRY[name].fn(spark, d).count()
                dt = time.time() - t0
                best_t = dt if best_t is None else min(best_t, dt)
            print(f"{name:34s} {label:9s} pairs={n:7d} warm={best_t:6.2f}s")


if __name__ == "__main__":
    main()
