#!/usr/bin/env python
"""Per-query wall census over the FULL registry: time each queries() entry
into the noop sink (guide §1.4) in one session, N passes, report min.

This is the engine-side complement of check_oracle (which mixes the DuckDB
oracle replay into its per-query walls): a ranking of where the engine
itself spends time, used to pick optimization targets and — run at two
scale factors — to flag super-linear rows.

Usage: python scripts/registry_walls.py [sf_dir] [out_json] [n_passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/registry_walls.json"
    n_passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from dumpr_spark.queries import REGISTRY
    from dumpr_spark.session import get_spark
    from dumpr_spark.sources.files import TPCH_TABLES, load_table

    spark = get_spark("registry_walls")
    spark.sparkContext.setLogLevel("ERROR")

    # warm scans (same convention as bench.py)
    for tbl in TPCH_TABLES:
        load_table(spark, sf_dir, tbl).write.format("noop").mode("overwrite").save()

    walls: dict[str, float] = {}
    errs: dict[str, str] = {}
    for rnd in range(n_passes):
        for name, q in REGISTRY.items():
            if name in errs:
                continue
            spark.sparkContext.setJobDescription(f"walls:{name}")
            t0 = time.time()
            try:
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                errs[name] = repr(e)[:200]
                continue
            dt = round(time.time() - t0, 3)
            walls[name] = min(walls.get(name, dt), dt)
        print(f"pass {rnd + 1}/{n_passes} done", flush=True)

    out = {"sf_dir": sf_dir, "loadavg": os.getloadavg()[0], "walls": walls, "errors": errs}
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    for name, w in sorted(walls.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{w:8.3f}s  {name}")
    if errs:
        print("ERRORS:", errs)


if __name__ == "__main__":
    main()
