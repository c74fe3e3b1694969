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


def register_views(con, sf_dir: str) -> None:
    """Register the testdata parquet tables as DuckDB views, mirroring the
    driver harness (shared with scripts/flake_hunt.py). Spark-written
    tables (e.g. the .sf1_local 10x copies) are DIRECTORIES of part
    files — glob those; the driver testdata is single files."""
    import os

    from dumpr_spark.sources.files import TPCH_TABLES

    for name in TPCH_TABLES:
        p = f"{sf_dir}/{name}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")


def check_one(spark, con, sf_dir: str, name: str):
    """Run ONE registry query on Spark and its oracle on DuckDB; return
    (status, detail) where status is 'ok' | 'rows' | 'fail'. Extracted so
    flake_hunt can reuse the exact gate semantics."""
    from dumpr_spark.queries import REGISTRY

    q = REGISTRY[name]
    try:
        spdf = q.fn(spark, sf_dir).toPandas()
    except Exception as e:
        return "fail", f"SPARK ERROR: {str(e)[:300]}"
    if q.oracle is None:
        return "rows", f"{len(spdf)} rows (no oracle)"
    try:
        # .df() (not fetchall) so DuckDB->pandas dtype coercion happens,
        # matching the driver harness (HUGEINT widens to float64 here).
        dpdf = con.sql(q.oracle).df()
    except Exception as e:
        return "fail", f"DUCKDB ERROR: {str(e)[:300]}"
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
            return "fail", f"CANON ERROR (driver would ERR): {str(e)[:300]}"
        if sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            problems.append(f"values differ; first diffs: {diffs}")
    if problems:
        return "fail", "; ".join(p[:400] for p in problems)
    return "ok", f"{len(spdf)} rows"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    from dumpr_spark.queries import REGISTRY
    from dumpr_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=8)
    con = duckdb.connect()
    register_views(con, sf_dir)

    passed, failed, skipped = [], [], []
    for name in sorted(REGISTRY):
        if only and name not in only:
            continue
        t0 = time.time()
        status, detail = check_one(spark, con, sf_dir, name)
        dt = f"[{time.time()-t0:.1f}s]"
        if status == "ok":
            passed.append(name)
            print(f"ok    {name}: {detail} {dt}")
        elif status == "rows":
            skipped.append(name)
            print(f"rows  {name}: {detail} {dt}")
        else:
            failed.append((name, detail))
            print(f"FAIL  {name}: {detail}")

    print(f"\n{len(passed)} ok, {len(failed)} FAILED, {len(skipped)} rows-only")
    if failed:
        print("failures:", ", ".join(n for n, _ in failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
