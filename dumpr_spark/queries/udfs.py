"""UDF / UDAF / UDTF surface (SURVEY §2.2-I), declared with SQL-expressible
semantics so every flavor is oracle-checked:

- scalar Python UDF        — the reference's arbitrary per-table id-fns
                             (core.clj:59-64) are exactly this shape
- vectorized pandas UDF    — Arrow-batched, the production path
- grouped-agg pandas UDF   — custom aggregate
- applyInPandas (grouped map) — per-group transform (z-score)

The hot path elsewhere never uses Python UDFs; this module exists to declare
and gate the escape hatch itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from dumpr_spark.queries.base import eps_round, query, register_views, t


@query(
    "udf_python_scalar",
    """
    SELECT o_orderkey, 'orders/' || CAST(o_orderkey AS VARCHAR) AS row_id
    FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
    """,
    tags=("udf",),
)
def udf_python_scalar(spark, sf_dir):
    """Row-at-a-time Python UDF: a custom id-fn building 'table/id' identity —
    the reference's entity-map key shape (test_util.clj:107-108). Deliberately
    the slow path; the fast path is the built-in concat twin below."""

    @F.udf(returnType=StringType())
    def id_fn(key):
        return f"orders/{key}"

    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select("o_orderkey", id_fn("o_orderkey").alias("row_id")).orderBy("o_orderkey")


@query(
    "udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) + 1e-7, 2) AS charge
    FROM lineitem WHERE l_orderkey <= 2000
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf",),
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized (Arrow) pandas UDF computing the TPC-H charge expression."""

    @F.pandas_udf(DoubleType())
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey", "l_linenumber",
        eps_round(charge("l_extendedprice", "l_discount", "l_tax"), 2, eps=1e-7).alias("charge"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "udf_grouped_agg",
    """
    SELECT c_nationkey, ROUND(AVG(c_acctbal) + 1e-9, 4) AS mean_bal
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    tags=("udf",),
)
def udf_grouped_agg(spark, sf_dir):
    """Grouped-aggregate pandas UDF (Series -> scalar)."""

    @F.pandas_udf(DoubleType())
    def mean_bal(bal: pd.Series) -> float:
        return float(bal.mean())

    c = t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(eps_round(mean_bal("c_acctbal"), 4).alias("mean_bal"))
        .orderBy("c_nationkey")
    )


@query(
    "udf_grouped_map_zscore",
    """
    SELECT c_custkey, c_nationkey,
           ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
                 / NULLIF(stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 0), 4) AS z
    FROM customer ORDER BY c_custkey
    """,
    tags=("udf",),
)
def udf_grouped_map_zscore(spark, sf_dir):
    """applyInPandas grouped-map: per-nation z-score of account balance.
    Oracle is the equivalent window formulation."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["c_acctbal"].std(ddof=1)
        z = (pdf["c_acctbal"] - pdf["c_acctbal"].mean()) / sd if sd and sd > 0 else pd.Series([None] * len(pdf), dtype="float64")
        return pd.DataFrame(
            {"c_custkey": pdf["c_custkey"], "c_nationkey": pdf["c_nationkey"], "z": z}
        )

    c = t(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_nationkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(zscore, "c_custkey bigint, c_nationkey int, z double")
        .select("c_custkey", "c_nationkey", F.round("z", 4).alias("z"))
        .orderBy("c_custkey")
    )


@query(
    "udf_table_function",
    """
    SELECT l_orderkey, CAST(unnest(generate_series(1, CAST(l_quantity AS INT))) AS INT) AS unit
    FROM lineitem WHERE l_orderkey <= 100 AND l_quantity <= 5
    ORDER BY l_orderkey, unit
    """,
    tags=("udf",),
)
def udf_table_function(spark, sf_dir):
    """Table-function surface: one row -> many (explode over a generated
    sequence) — the multi-row-event fan-out shape (R10, stream.clj:264-268)."""
    li = t(spark, sf_dir, "lineitem").where((F.col("l_orderkey") <= 100) & (F.col("l_quantity") <= 5))
    return (
        li.select(
            "l_orderkey",
            F.explode(F.sequence(F.lit(1), F.col("l_quantity").cast("int"))).alias("unit"),
        )
        .select("l_orderkey", F.col("unit").cast("int").alias("unit"))
        .orderBy("l_orderkey", "unit")
    )


@query(
    "udf_python_udtf",
    """
    SELECT doc_id, tk[i] AS tok, CAST(i - 1 AS INT) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id < 20) d,
         LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) g
    ORDER BY doc_id, pos
    """,
    tags=("udf", "udtf"),
)
def udf_python_udtf(spark, sf_dir):
    """True Python UDTF (Spark 3.5+/4.x @udtf): one input row -> many output
    rows via a lateral join — the reference's one-event-to-many-rows explode
    (R10, stream.clj:264-268) as a user-defined table function. Arrow-batched;
    for hot paths prefer the built-in explode (udf_table_function)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield tok, i

    spark.udtf.register("dumpr_tokenize", Tokenize)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT doc_id, t.tok, t.pos
        FROM documents, LATERAL dumpr_tokenize(text) t
        WHERE doc_id < 20
        ORDER BY doc_id, pos
        """
    )


@query(
    "udf_arrow_scalar",
    """
    SELECT p_partkey,
           upper(substr(p_name, 1, 1)) || '-' || CAST(p_size AS VARCHAR) AS part_tag
    FROM part WHERE p_partkey <= 400
    ORDER BY p_partkey
    """,
    tags=("udf", "spark4"),
)
def udf_arrow_scalar(spark, sf_dir):
    """Arrow-optimized Python scalar UDF (`useArrow=True`, Spark 3.5+/4):
    the SAME row-at-a-time Python function as the classic UDF, but the
    executor<->Python transfer is Arrow record batches instead of pickled
    rows — the drop-in upgrade for Python logic that can't be vectorized
    into a pandas_udf (per-row control flow, external library calls). The
    middle rung of the three-tier UDF ladder this family declares:
    built-in >> pandas_udf >> arrow-UDF >> pickled UDF.

    Scale shape: still per-row Python (keep it OFF the hot path at 100 TB
    — the built-in twin is the oracle), but serialization is batched and
    columnar, and the scan still prunes to the two input columns."""
    from pyspark.sql.functions import udf

    @udf(returnType=StringType(), useArrow=True)
    def part_tag(name, size):
        return f"{name[0].upper()}-{size}"

    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 400)
    return p.select(
        "p_partkey", part_tag("p_name", "p_size").alias("part_tag")
    ).orderBy("p_partkey")


@query(
    "udf_map_in_arrow",
    """
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l_extendedprice) + 1e-9, 2) AS order_revenue
    FROM lineitem WHERE l_orderkey <= 1000
    GROUP BY l_orderkey ORDER BY l_orderkey
    """,
    tags=("udf", "spark4"),
)
def udf_map_in_arrow(spark, sf_dir):
    """mapInArrow: per-partition transformation receiving raw
    ``pyarrow.RecordBatch``es — the zero-copy tier below mapInPandas (no
    pandas materialization at all), for batch logic that talks Arrow
    natively (Arrow compute kernels, Arrow-IPC shipping, GPU libraries).
    Here each partition pre-aggregates (orderkey, count, revenue) with
    Arrow's own group_by kernel, and a final groupBy merges the per-
    partition partials — the hand-rolled map-side-combine shape, checked
    against the plain SQL aggregate.

    Scale shape: the Python stage is a per-partition streaming pass over
    Arrow batches (no row objects, no pandas copies); the shuffle carries
    one partial row per (partition, orderkey) — the same wire volume a
    JVM partial HashAggregate would ship."""
    import pyarrow as pa

    def partial_agg(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            agg = tbl.group_by("l_orderkey").aggregate(
                [("l_extendedprice", "sum"), ("l_orderkey", "count")]
            )
            agg = agg.rename_columns(["l_orderkey", "rev", "cnt"])
            for out in agg.to_batches():
                yield out

    li = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") <= 1000)
        .select("l_orderkey", "l_extendedprice")
    )
    partials = li.mapInArrow(
        partial_agg, "l_orderkey long, rev double, cnt long"
    )
    return (
        partials.groupBy("l_orderkey")
        .agg(
            F.sum("cnt").cast("long").alias("n_lines"),
            eps_round(F.sum("rev"), 2).alias("order_revenue"),
        )
        .orderBy("l_orderkey")
    )
