#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet tables;
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, stringify values."""
    idx = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # canonical float repr (round-trip safe, kills -0.0 vs 0.0)
            return repr(v + 0.0)
        if isinstance(v, bool):
            return str(v).lower()
        return str(v)

    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    from dumpr_spark.queries import REGISTRY
    from dumpr_spark.session import get_spark
    from dumpr_spark.sources.files import TPCH_TABLES

    spark = get_spark("check_oracle", cpus=8)
    con = duckdb.connect()
    for name in TPCH_TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    passed, failed, skipped = [], [], []
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if q.oracle is None:
            skipped.append((name, len(srows)))
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(q.oracle)
            drows = ddf.fetchall()
            dcols = [d[0] for d in ddf.description]
        except Exception as e:
            failed.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sn, dn = normalize([list(r) for r in srows], scols), normalize(drows, dcols)
            if sn != dn:
                diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(p[:400] for p in problems)}")
        else:
            passed.append(name)
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(passed)} ok, {len(failed)} FAILED, {len(skipped)} rows-only")
    if failed:
        print("failures:", ", ".join(n for n, _ in failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
