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


def normalize(pdf):
    """Driver-mimicking canonical form over a pandas DataFrame: sort columns
    by name, sort rows by ALL columns (raises TypeError on unhashable cells,
    e.g. raw array columns — exactly like the driver's canonicalizer), then
    stringify AFTER pandas dtype coercion so dtype drift is visible (DuckDB
    HUGEINT -> float64 widening renders 1 as '1.0' while Spark's int64
    renders '1' — a driver hash mismatch the old tuple-based form missed)."""
    import numpy as np
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    pdf = pdf.reset_index(drop=True)

    def canon(v):
        if v is None or v is pd.NaT:
            return "NULL"
        if isinstance(v, (float, np.floating)):
            if math.isnan(v):
                return "NaN"
            # canonical float repr (round-trip safe, kills -0.0 vs 0.0)
            return repr(float(v) + 0.0)
        if isinstance(v, (bool, np.bool_)):
            return str(bool(v)).lower()
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    return [tuple(canon(v) for v in row) for row in pdf.itertuples(index=False)]


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
            spdf = sdf.toPandas()
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if q.oracle is None:
            skipped.append((name, len(spdf)))
            print(f"rows  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            # .df() (not fetchall) so DuckDB->pandas dtype coercion happens,
            # matching the driver harness (HUGEINT widens to float64 here).
            dpdf = con.sql(q.oracle).df()
        except Exception as e:
            failed.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount spark={len(spdf)} duckdb={len(dpdf)}")
        if sorted(spdf.columns) != sorted(dpdf.columns):
            problems.append(
                f"cols spark={sorted(spdf.columns)} duckdb={sorted(dpdf.columns)}"
            )
        if not problems:
            try:
                sn, dn = normalize(spdf), normalize(dpdf)
            except Exception as e:
                failed.append((name, f"CANON ERROR: {e}"))
                print(f"FAIL  {name}: canonicalize error (driver would ERR): {str(e)[:300]}")
                continue
            if sn != dn:
                diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(p[:400] for p in problems)}")
        else:
            passed.append(name)
            print(f"ok    {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(passed)} ok, {len(failed)} FAILED, {len(skipped)} rows-only")
    if failed:
        print("failures:", ", ".join(n for n, _ in failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
