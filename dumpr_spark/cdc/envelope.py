"""The canonical change-envelope schema and constructors.

Reference data model (/root/reference/src/dumpr/row_format.clj:5-15,
README.md:121-131): every change is ``[op-type table id content meta]`` where
``op-type`` in {upsert, delete, error}, ``content`` is the full row image
AFTER the op (not a delta), and ``meta`` carries the event timestamp plus the
binlog resume coordinate {file, position} (events.clj:52-54, stream.clj:56-74).

Spark re-expression: a DataFrame with a fixed envelope schema. Two deliberate
design choices for 100 TB scale:

- ``id`` is normalized to STRING. The reference allows any single-column PK or
  an arbitrary user id-fn result (core.clj:59-64); a single orderable type
  keeps the (tbl, id) shuffle key compact and skew-handling uniform.
- ``content`` is a JSON string (full row image). Per-table *typed* views are
  recovered with ``from_json`` against the table's StructType — the same
  late-binding the reference does by zipping binlog positional values with a
  fetched schema (stream.clj:233-244). Storing the envelope as Parquet keeps
  the columnar scan cheap: materialization reads only (tbl, id, op, seq).
- ``seq`` reifies the reference's total stream order (core.clj:85-89):
  Spark has no cross-partition emission order, so order is data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OP_UPSERT = "upsert"
OP_DELETE = "delete"
OP_ERROR = "error"

# src/dumpr/row_format.clj:5-15 mapped to columns; meta flattened
# (ts, next_file, next_position) per events.clj:52-54 + stream.clj:70-74.
ENVELOPE_SCHEMA = StructType(
    [
        StructField("op", StringType(), nullable=False),
        StructField("tbl", StringType(), nullable=False),
        StructField("id", StringType(), nullable=False),
        StructField("content", StringType(), nullable=True),  # NULL only for op='error'
        StructField("ts", TimestampType(), nullable=True),  # NULL for snapshot rows
        StructField("next_file", StringType(), nullable=True),
        StructField("next_position", LongType(), nullable=True),
        StructField("seq", LongType(), nullable=False),
    ]
)

ENVELOPE_COLS = [f.name for f in ENVELOPE_SCHEMA.fields]


def snapshot_to_changes(
    df: DataFrame,
    table: str,
    id_col: str | Column,
    seq: Column | None = None,
    table_seq: int = 0,
) -> DataFrame:
    """Batch snapshot -> upsert envelope rows (reference R1, query.clj:45-64).

    Snapshot rows have NULL meta (row_format.clj:10, README.md:131). The
    reference loads tables strictly in order via ``pipeline-async 1``
    (stream.clj:309-312); here per-table order is reified in ``seq``:
    ``table_seq * 2^53 + monotonic-within-table`` so a later table's rows sort
    after an earlier table's, while rows within a table keep a stable order
    without any global coordination (no driver-side loop, no single partition).

    ``monotonically_increasing_id`` is partition-local monotone — adequate
    because the reference itself only guarantees order *between* tables and
    stream position, not row order inside one snapshot SELECT. Its value is
    ``(partitionId << 33) | offset``, so a 2^53 stride keeps cross-table order
    intact up to 2^20 (~1M) input partitions per table — a 100 TB scan at
    128 MB splits is ~800k partitions — and 1023 tables per snapshot. (The
    old 2^40 stride silently broke table order at just 128 partitions.)
    """
    id_c = F.col(id_col) if isinstance(id_col, str) else id_col
    if seq is None:
        if not 0 <= table_seq <= 1023:
            # 1024 * 2^53 overflows int64 (ANSI off would wrap silently into
            # negative/disordered seq values — fail loudly instead).
            raise ValueError(f"table_seq must be in 0..1023, got {table_seq}")
        seq = F.lit(table_seq).cast("long") * F.lit(1 << 53) + F.monotonically_increasing_id()
    return df.select(
        F.lit(OP_UPSERT).alias("op"),
        F.lit(table).alias("tbl"),
        id_c.cast("string").alias("id"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("content"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("string").alias("next_file"),
        F.lit(None).cast("long").alias("next_position"),
        seq.cast("long").alias("seq"),
    )


def typed_view(changes: DataFrame, table: str, schema: StructType) -> DataFrame:
    """Recover a typed per-table DataFrame from envelope rows.

    The late-bound equivalent of the reference's row decode (stream.clj:233-244):
    content JSON is parsed against the table's schema fetched from the catalog.

    Envelope meta columns (op/id/seq/ts) that collide with a payload column
    name are emitted with a ``_cdc_`` prefix — the payload keeps its natural
    name (tables with an ``id`` PK are the common case).
    """
    payload_names = {f.name for f in schema.fields}
    meta = [
        F.col(c).alias(f"_cdc_{c}") if c in payload_names else F.col(c)
        for c in ("op", "id", "seq", "ts")
    ]
    return (
        changes.where(F.col("tbl") == table)
        .withColumn("row", F.from_json("content", schema))
        .select(*meta, "row.*")
    )


def validate_envelope(df: DataFrame) -> DataFrame:
    """Enforce the row-format preconditions as a filter + in-band errors.

    The reference asserts id non-nil and delete-has-meta at construction
    (row_format.clj:8,12) and surfaces failures as in-band ``:error`` tuples
    (row_format.clj:15, stream.clj:179-191). We map violations to op='error'
    rows (dead-letter-in-band) rather than raising, preserving that contract.
    """
    bad = (
        F.col("id").isNull()
        | ~F.col("op").isin(OP_UPSERT, OP_DELETE, OP_ERROR)
        | ((F.col("op") == OP_DELETE) & F.col("ts").isNull() & F.col("next_position").isNull())
    )
    return df.select(
        F.when(bad, F.lit(OP_ERROR)).otherwise(F.col("op")).alias("op"),
        F.col("tbl"),
        F.coalesce(F.col("id"), F.lit("")).alias("id"),
        F.when(bad, F.to_json(F.struct(F.lit("invalid-envelope-row").alias("error"), F.col("content").alias("data"))))
        .otherwise(F.col("content"))
        .alias("content"),
        F.col("ts"),
        F.col("next_file"),
        F.col("next_position"),
        F.col("seq"),
    )
