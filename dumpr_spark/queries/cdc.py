"""CDC semantics as oracle-checked queries.

The envelope is derived *deterministically from the testdata* inside each
query (both engines derive the identical stream), so the driver's DuckDB
oracle can check the reference semantics end-to-end:

synthetic change stream over `orders`:
  - seq = o_orderkey*3      : initial upsert (snapshot image)
  - seq = o_orderkey*3+1    : update (price *2 — integer-exact on both
                              engines, no round-boundary noise) for
                              orderkey % 5 == 0
  - seq = o_orderkey*3+2    : delete for orderkey % 7 == 0
Expected state: orders minus the %7 deletes, with %5 (and not %7) updated.
This mirrors the reference generator model (insert→update→delete sequences,
core_test.clj:86-113) at table scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dumpr_spark.cdc.envelope import snapshot_to_changes
from dumpr_spark.cdc.materialize import materialize
from dumpr_spark.queries.base import query, t

# DuckDB-side synthetic stream (identical derivation; content carried as
# typed columns — the JSON content column is exercised by cdc_envelope_shape).
_CHANGES_CTE = """
    WITH changes AS (
      SELECT 'upsert' AS op, CAST(o_orderkey AS VARCHAR) AS id, o_orderkey,
             o_totalprice, o_orderstatus, CAST(o_orderkey * 3 AS BIGINT) AS seq
      FROM orders
      UNION ALL
      SELECT 'upsert', CAST(o_orderkey AS VARCHAR), o_orderkey,
             o_totalprice * 2, o_orderstatus, CAST(o_orderkey * 3 + 1 AS BIGINT)
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT 'delete', CAST(o_orderkey AS VARCHAR), o_orderkey,
             NULL, NULL, CAST(o_orderkey * 3 + 2 AS BIGINT)
      FROM orders WHERE o_orderkey % 7 = 0
    )
"""


def _synthetic_changes(spark, sf_dir) -> DataFrame:
    """Spark side of the identical synthetic stream, in envelope shape
    (content = JSON row image, as the real CDC path produces).

    Built from ONE scan of orders: each row emits its 1-3 envelope variants
    (base upsert / %5 update / %7 delete) as an array a single explode
    flattens. Row-multiset-identical to the previous three-scan
    union-of-`snapshot_to_changes` formulation (that true snapshot path is
    still exercised by `cdc_envelope_shape` and the engine tests) but reads
    and JSON-encodes the table once instead of three times."""
    # the sf-dir table is one compact parquet file = one input partition;
    # fan rows across the cluster BEFORE the per-row JSON encoding and
    # 1-3x explode (same pre-multiplication repartition as minhash shingling).
    # CONDITIONAL: only when the scan under-parallelizes — a 100 TB input is
    # already ~800k splits, and an unconditional repartition there is a full-
    # table round-robin shuffle for nothing (r3 interleaved A/B: the shuffle
    # costs ~10% at sf0.1 even against a page-cached triple scan; skipping it
    # when the scan is wide makes this the strictly-cheapest form: one scan,
    # zero extra shuffles)
    n_parts = spark.sparkContext.defaultParallelism
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    if o.rdd.getNumPartitions() < n_parts // 2:
        o = o.repartition(n_parts)
    k = F.col("o_orderkey")

    def env(op, content, ts, nfile, npos, seq):
        return F.struct(
            op.alias("op"),
            F.lit("orders").alias("tbl"),
            k.cast("string").alias("id"),
            content.alias("content"),
            ts.alias("ts"),
            nfile.alias("next_file"),
            npos.alias("next_position"),
            seq.cast("long").alias("seq"),
        )

    null_ts = F.lit(None).cast("timestamp")
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    base = env(
        F.lit("upsert"),
        F.to_json(F.struct(k, F.col("o_totalprice"), F.col("o_orderstatus"))),
        null_ts, null_s, null_l, k * 3,
    )
    # *2 keeps the price on the 2-decimal lattice => cross-engine ROUND is
    # boundary-free (a 1.1 multiplier would create .xx5 values where Spark's
    # decimal-repr HALF_UP and DuckDB's binary round can disagree)
    update = F.when(
        k % 5 == 0,
        env(
            F.lit("upsert"),
            F.to_json(F.struct(
                k, (F.col("o_totalprice") * 2).alias("o_totalprice"), F.col("o_orderstatus")
            )),
            null_ts, null_s, null_l, k * 3 + 1,
        ),
    )
    delete = F.when(
        k % 7 == 0,
        env(
            F.lit("delete"), null_s,
            F.lit("2024-01-01 00:00:00").cast("timestamp"),
            F.lit("binlog.000001"), (k * 3 + 2).cast("long"), k * 3 + 2,
        ),
    )
    variants = F.filter(F.array(base, update, delete), lambda x: x.isNotNull())
    return o.select(F.explode(variants).alias("e")).select("e.*")


@query(
    "cdc_materialize",
    _CHANGES_CTE
    + """
    , latest AS (
      SELECT id, arg_max(o_orderkey, seq) AS o_orderkey,
             arg_max(o_totalprice, seq) AS o_totalprice,
             arg_max(op, seq) AS last_op, MAX(seq) AS seq
      FROM changes GROUP BY id
    )
    SELECT CAST(id AS BIGINT) AS order_id, ROUND(o_totalprice, 2) AS price, seq
    FROM latest WHERE last_op <> 'delete'
    ORDER BY order_id
    """,
    tags=("cdc", "flagship"),
)
def cdc_materialize(spark, sf_dir):
    """End-to-end last-write-wins materialization (entity-map fold,
    test_util.clj:110-123) over the synthetic change stream."""
    state = materialize(_synthetic_changes(spark, sf_dir))
    row = F.from_json("content", "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
    return (
        state.withColumn("row", row)
        .select(
            F.col("id").cast("long").alias("order_id"),
            F.round(F.col("row.o_totalprice"), 2).alias("price"),
            F.col("seq"),
        )
        .orderBy("order_id")
    )


@query(
    "cdc_dedup_latest_window",
    _CHANGES_CTE
    + """
    , ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
      FROM changes
    )
    SELECT CAST(id AS BIGINT) AS order_id, ROUND(o_totalprice, 2) AS price
    FROM ranked WHERE rn = 1 AND op <> 'delete'
    ORDER BY order_id
    """,
    tags=("cdc", "window"),
)
def cdc_dedup_latest_window(spark, sf_dir):
    """The window formulation of materialize (dedup-latest, SURVEY §2.2-E) —
    declared alongside the max_by form to pin both shapes."""
    from pyspark.sql import Window

    ch = _synthetic_changes(spark, sf_dir)
    row = F.from_json("content", "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
    w = Window.partitionBy("id").orderBy(F.desc("seq"))
    return (
        ch.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "delete"))
        .withColumn("row", row)
        .select(
            F.col("id").cast("long").alias("order_id"),
            F.round(F.col("row.o_totalprice"), 2).alias("price"),
        )
        .orderBy("order_id")
    )


@query(
    "cdc_filter_tables",
    _CHANGES_CTE
    + """
    SELECT op, CAST(COUNT(*) AS BIGINT) AS n
    FROM changes
    WHERE 'orders' IN ('orders', 'lineitem')  -- tbl filter allows 'orders'
    GROUP BY op ORDER BY op
    """,
    tags=("cdc",),
)
def cdc_filter_tables(spark, sf_dir):
    """Table-set filter over the envelope (R8) + op histogram."""
    from dumpr_spark.cdc.filters import filter_tables

    ch = filter_tables(_synthetic_changes(spark, sf_dir), ["orders", "lineitem"])
    return ch.groupBy("op").agg(F.count(F.lit(1)).alias("n")).orderBy("op")


@query(
    "cdc_next_position",
    _CHANGES_CTE
    + """
    SELECT arg_max(seq, seq) AS position
    FROM changes WHERE op = 'delete'
    """,
    tags=("cdc",),
)
def cdc_next_position(spark, sf_dir):
    """Resume-coordinate capture (R13): max-by-seq over rows that carry binlog
    meta (here: the deletes, which embed seq as next_position)."""
    ch = _synthetic_changes(spark, sf_dir)
    return (
        ch.where(F.col("next_position").isNotNull())
        .agg(F.max_by("next_position", "seq").alias("position"))
    )


@query(
    "cdc_envelope_shape",
    _CHANGES_CTE
    + """
    SELECT CAST(id AS BIGINT) AS order_id,
           CAST(o_orderkey AS BIGINT) AS content_key,
           o_orderstatus AS content_status
    FROM changes WHERE op = 'upsert' AND seq % 3 = 0 AND o_orderkey <= 100
    ORDER BY order_id, content_key
    """,
    tags=("cdc",),
)
def cdc_envelope_shape(spark, sf_dir):
    """Round-trip through the JSON content column: row image serialized at
    ingest, recovered typed via from_json (late binding, stream.clj:233-244)."""
    ch = _synthetic_changes(spark, sf_dir)
    row = F.from_json("content", "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
    return (
        ch.where((F.col("op") == "upsert") & (F.col("seq") % 3 == 0))
        .withColumn("row", row)
        .where(F.col("row.o_orderkey") <= 100)
        .select(
            F.col("id").cast("long").alias("order_id"),
            F.col("row.o_orderkey").alias("content_key"),
            F.col("row.o_orderstatus").alias("content_status"),
        )
        .orderBy("order_id", "content_key")
    )
