"""CDC event-stream source: binlog-shaped JSON events (R2/R3).

The reference wraps MySQL's BinaryLogClient (/root/reference/src/dumpr/binlog.clj:29-51)
and parses native events into tuples (events.clj:52-148). The Spark-native
equivalent consumes an *already-serialized* CDC feed — files or Kafka carrying
one JSON event per record (in production a Debezium-format topic) — and parses
with ``from_json`` against a fixed event schema. Event types the reference
parses (events.clj:14-50): rotate, query (BEGIN/COMMIT/ROLLBACK/ALTER TABLE),
xid, table-map, write/update/delete rows, stop; unparsed types drop to NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, LongType, MapType, StringType, StructField, StructType, TimestampType,
)

# One record per binlog event. `rows` carries the full row images for
# write/update/delete (one event may carry MANY rows, stream.clj:264-268);
# `rotate_file` only on rotate; `query` only on query events.
EVENT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),  # write|update|delete|tx-begin|tx-commit|tx-rollback|rotate|table-map|alter-table|stop
        StructField("db", StringType(), True),
        StructField("tbl", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("next_position", LongType(), True),
        StructField("rotate_file", StringType(), True),
        StructField("query", StringType(), True),  # raw SQL on query events (DDL detection, events.clj:88)
        StructField("rows", ArrayType(MapType(StringType(), StringType())), True),
        StructField("seq", LongType(), False),
    ]
)


def read_events_json(spark: SparkSession, path: str, streaming: bool = False,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Read a binlog-shaped JSON event feed, batch or streaming.

    maxFilesPerTrigger is the rate-limit analog of the reference's bounded
    channel backpressure (R16, core.clj:78,150).
    """
    if streaming:
        reader = spark.readStream.schema(EVENT_SCHEMA)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return reader.json(path)
    return spark.read.schema(EVENT_SCHEMA).json(path)


def parse_event_lines(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse raw string records (e.g. kafka value) into typed events —
    the from_json re-expression of events.clj:52-148. Records that don't
    parse (unknown types) yield NULL event_type and are dropped, mirroring
    the reference's nil => removed (events.clj:70-71)."""
    return (
        df.select(F.from_json(F.col(value_col).cast("string"), EVENT_SCHEMA).alias("e"))
        .select("e.*")
        .where(F.col("event_type").isNotNull())
    )


# ---------------------------------------------------------------------------
# Debezium envelope adapter
# ---------------------------------------------------------------------------
# The production feed SURVEY §1.4/§4.2 names is a Debezium-format topic: each
# record value is `{"payload": {"before", "after", "op", "ts_ms", "source":
# {"db", "table", "file", "pos", "row", ...}}}` (Debezium's documented MySQL
# connector wire format). This adapter maps that wire shape onto the engine
# envelope, replacing the reference's own binlog decode (binlog.clj:29-51 +
# events.clj:52-148) at the source boundary. Row images parse as
# map<string,string> — the same opaque row shape `events_to_changes` uses, so
# everything downstream (materialize, sinks, schema enrichment) is shared.
#
# Transaction filtering (R4) is BYPASSED on this path by design: Debezium
# only publishes committed transactions, so the engine's tx filter would be a
# no-op — the reference needs it because it tails the raw binlog where
# uncommitted/rolled-back events appear (stream.clj:22-54).
DEBEZIUM_SOURCE_SCHEMA = StructType(
    [
        StructField("db", StringType(), True),
        StructField("table", StringType(), True),
        StructField("file", StringType(), True),   # binlog filename (R5 analog)
        StructField("pos", LongType(), True),      # binlog position (R13 analog)
        StructField("row", LongType(), True),      # row ordinal within the event
        StructField("snapshot", StringType(), True),
    ]
)
DEBEZIUM_SCHEMA = StructType(
    [
        StructField(
            "payload",
            StructType(
                [
                    StructField("before", MapType(StringType(), StringType()), True),
                    StructField("after", MapType(StringType(), StringType()), True),
                    StructField("op", StringType(), True),  # c|u|d|r
                    StructField("ts_ms", LongType(), True),
                    StructField("source", DEBEZIUM_SOURCE_SCHEMA, True),
                ]
            ),
            True,
        )
    ]
)


def parse_debezium_lines(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw records (e.g. Kafka value bytes) -> flattened Debezium payloads.

    Tombstone records (null value — Debezium's compaction marker after a
    delete) and values that don't parse as a Debezium envelope yield a NULL
    payload/op and are dropped, mirroring parse_event_lines' nil => removed
    discipline."""
    return (
        df.select(
            F.from_json(F.col(value_col).cast("string"), DEBEZIUM_SCHEMA).alias("d")
        )
        .select("d.payload.*")
        .where(F.col("op").isNotNull())
    )


def debezium_to_changes(
    payloads: DataFrame, id_cols: dict[str, str], carry_row_ordinal: bool = False
) -> DataFrame:
    """Flattened Debezium payloads -> canonical envelope rows.

    carry_row_ordinal=True appends the original `source.row` as an extra
    `row_ordinal` column (beyond the canonical 8-column envelope), which
    `changes_to_debezium` prefers over re-deriving the ordinal from seq —
    the lossless round-trip for wire consumers that read source.row.
    Default False keeps the canonical envelope shape for unionByName with
    other envelope sources.

    op mapping: d -> delete; c/u/r -> upsert (r = snapshot read, which IS the
    engine's snapshot-as-upserts convention, R1). The row image is `after`
    for upserts and `before` for deletes (Debezium's delete `after` is null).
    id_cols follows events_to_changes: table -> PK column name or Column
    expression over `row`.

    seq reifies Debezium's total order (binlog file, position, row-in-event)
    into one monotone long: numeric binlog-file suffix << 42 | pos << 10 |
    row. Budgets: file number 20 bits (covers MySQL's 6-digit suffixes up to
    999999), position 32 bits (binlog files are capped at 1 GiB by
    max_binlog_size and cannot reach 4 GiB even with one oversized trailing
    transaction), row-in-event 10 bits — 62 bits total, so the packed value
    never touches the int64 sign bit (a sign flip would order NEW events
    BEFORE old ones and make the max-by-seq fold keep stale rows forever).
    Each component is saturated with least() at its budget: an
    out-of-contract value degrades to a tie at the clamp point (resolved by
    the fold's arbitrary-but-stable pick) instead of inverting the order."""

    def _id_val(c):
        return F.col("row").getItem(c) if isinstance(c, str) else c

    id_expr = F.coalesce(
        *[F.when(F.col("tbl") == t, _id_val(c)) for t, c in id_cols.items()]
    ) if id_cols else F.lit(None)
    file_no = F.least(
        F.coalesce(
            F.regexp_extract(F.col("source.file"), r"(\d+)$", 1).cast("long"), F.lit(0)
        ),
        F.lit((1 << 20) - 1),
    )
    shaped = payloads.select(
        F.when(F.col("op") == "d", F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
        F.col("source.table").alias("tbl"),
        F.coalesce(F.col("after"), F.col("before")).alias("row"),
        F.to_json(F.coalesce(F.col("after"), F.col("before"))).alias("content"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        F.col("source.file").alias("next_file"),
        F.col("source.pos").alias("next_position"),
        (
            F.shiftleft(file_no, 42)
            + F.shiftleft(
                F.least(F.coalesce(F.col("source.pos"), F.lit(0)), F.lit((1 << 32) - 1)),
                10,
            )
            + F.least(F.coalesce(F.col("source.row"), F.lit(0)), F.lit((1 << 10) - 1))
        ).cast("long").alias("seq"),
        F.coalesce(F.col("source.row"), F.lit(0)).cast("long").alias("row_ordinal"),
    )
    cols = [
        F.col("op"), F.col("tbl"), id_expr.cast("string").alias("id"),
        F.col("content"), F.col("ts"), F.col("next_file"),
        F.col("next_position"), F.col("seq"),
    ]
    if carry_row_ordinal:
        cols.append(F.col("row_ordinal"))
    return shaped.select(*cols)


def events_to_changes(events: DataFrame, id_cols: dict[str, str]) -> DataFrame:
    """Row events -> envelope rows: explode multi-row events, compute id, shape
    to the canonical envelope (R10, stream.clj:233-269).

    id_cols maps table -> id derivation: a PK column name inside the row map
    (the reference's default id-fn, the PK lookup, table_schema.clj:48-51) OR
    a Column expression over `row` (the exploded map column) for custom
    id-fns — any function of the row image, core.clj:59-64; e.g.
    ``F.concat(F.col("row")["a"], F.lit("/"), F.col("row")["b"])`` for a
    composite key, or a Python UDF for arbitrary logic. CAUTION: Python UDFs
    are batch-extracted and evaluated on EVERY row-event before the per-table
    ``when()`` applies (when/coalesce cannot short-circuit a Python UDF), so
    a UDF id-fn MUST tolerate None / other tables' row shapes.
    ``explode`` + ordinal keeps a deterministic intra-event order: the
    reference flat-maps one mutation event into many tuples (stream.clj:374-376).
    """

    def _id_val(c):
        return F.col("row").getItem(c) if isinstance(c, str) else c

    id_expr = F.coalesce(
        *[F.when(F.col("tbl") == t, _id_val(c)) for t, c in id_cols.items()]
    ) if id_cols else F.lit(None)
    row_events = events.where(F.col("event_type").isin("write", "update", "delete"))
    exploded = row_events.select(
        "*", F.posexplode("rows").alias("_row_idx", "row")
    )
    nf = F.col("next_file") if "next_file" in events.columns else F.lit(None).cast("string")
    return exploded.select(
        F.when(F.col("event_type") == "delete", F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
        F.col("tbl"),
        id_expr.cast("string").alias("id"),
        F.to_json(F.col("row")).alias("content"),
        F.col("ts"),
        nf.alias("next_file"),
        F.col("next_position"),
        # sub-sequence rows within one event keep their ordinal (explode order)
        (F.col("seq") * F.lit(1 << 16) + F.col("_row_idx")).cast("long").alias("seq"),
    )


def changes_to_debezium(changes: DataFrame, db: str) -> DataFrame:
    """Egress adapter: canonical envelope rows -> Debezium-wire JSON values
    (one string per record, ready for a Kafka value or a JSONL feed). The
    inverse of parse_debezium_lines + debezium_to_changes, completing the
    CDC round-trip: an engine materialization can republish its change feed
    in the same production format it consumes.

    Mapping: delete -> op 'd' with the row image in `before` (`after` null,
    Debezium's delete convention); upsert -> op 'u' with the image in
    `after` (the envelope does not distinguish create from update, so
    creates degrade to 'u' — downstream entity folds treat c/u/r
    identically, as does debezium_to_changes). source.{file,pos} carry the
    binlog position; source.row carries the input's `row_ordinal` column
    when present (the lossless path — pair with
    ``debezium_to_changes(..., carry_row_ordinal=True)``), else it is
    re-derived from the envelope seq's low 16 bits. The re-derivation is
    only FAITHFUL for events_to_changes-packed seqs (seq<<16 | row): for
    Debezium-origin seqs (file<<42 | pos<<10 | row) it yields
    (pos&63)<<10 | row, clamped — ordering still survives (monotone +
    saturating clamp, never an inversion), but the emitted row ordinal is
    then positional noise for wire consumers and intra-event order
    collapses to a tie on re-ingest.

    Pure narrow projection (from_json of the content + to_json of the
    struct) — fuses into whatever plan feeds it, no shuffle."""
    row_img = F.from_json(F.col("content"), MapType(StringType(), StringType()))
    is_del = F.col("op") == "delete"
    payload = F.struct(
        F.when(is_del, row_img).alias("before"),
        F.when(~is_del, row_img).alias("after"),
        F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
        (F.unix_millis(F.col("ts"))).alias("ts_ms"),
        F.struct(
            F.lit(db).alias("db"),
            F.col("tbl").alias("table"),
            F.col("next_file").alias("file"),
            F.col("next_position").alias("pos"),
            # Prefer the carried original ordinal; else extract
            # events_to_changes' 16-bit packing, then saturate at the
            # Debezium adapter's 10-bit budget so an oversized event
            # degrades to a TIE at the clamp (same discipline as
            # debezium_to_changes' least()), never an order INVERSION — a
            # plain % (1<<10) would wrap row 1024 to 0 and re-ingest it
            # BEFORE row 1023. See docstring for the Debezium-origin-seq
            # fidelity caveat on the derived path.
            (
                # coalesce: a union of carried + canonical envelopes has a
                # row_ordinal column that is NULL on the canonical rows —
                # those must still get the derived ordinal, not source.row
                # = null (which re-ingests as row 0)
                F.coalesce(
                    F.col("row_ordinal"),
                    F.least(F.col("seq") % F.lit(1 << 16), F.lit((1 << 10) - 1)),
                )
                if "row_ordinal" in changes.columns
                else F.least(F.col("seq") % F.lit(1 << 16), F.lit((1 << 10) - 1))
            )
            .cast("long")
            .alias("row"),
        ).alias("source"),
    )
    return changes.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("value")
    )
