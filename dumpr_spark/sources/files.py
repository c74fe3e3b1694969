"""Batch file sources: Parquet (primary), CSV, JSON.

Parquet is the engine's storage format — columnar scans get predicate pushdown,
column pruning, and vectorized reads from Catalyst for free (SURVEY §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Testdata physical quirk: events.ts is parquet TIMESTAMP(NANOS), which Spark
# only reads via the nanosAsLong escape hatch (as a long of epoch-nanos).
# Convert to TIMESTAMP_NTZ at μs precision — the same truncation DuckDB applies
# when it narrows ns→μs, so oracle comparisons line up.
_NANO_TS_COLS = {"events": ("ts",)}


def _nanos_to_ntz(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    for c in cols:
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"{c} div 1000")).cast("timestamp_ntz")
            )
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with type normalization (ns→NTZ where needed)."""
    df = read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
    return _nanos_to_ntz(df, _NANO_TS_COLS.get(name, ()))


def read_csv(spark: SparkSession, path: str, schema: StructType | str | None = None, **options) -> DataFrame:
    reader = spark.read.options(header="true", **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str | None = None, **options) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_table_dir(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    """Load the driver's testdata layout: one parquet per table under sf_dir."""
    out = {}
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            out[t] = load_table(spark, sf_dir, t)
    return out
