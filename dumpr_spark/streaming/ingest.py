"""Streaming CDC ingest: binlog-shaped JSON feed -> envelope stream ->
materialized state (the live path of the reference, R2/R3 -> R18).

Pipeline (mirrors stream.clj:348-382's fixed transducer chain, but as an
incrementalized Catalyst plan):

  readStream(json events)                  # R2  binlog.clj:29-51
    -> filter committed/db/tables          # R4/R7/R8 (source-side or here)
    -> events_to_changes (explode rows)    # R10 stream.clj:233-269
    -> writeStream.foreachBatch(merge)     # entity-map fold, test_util.clj:110-123
         + checkpoint                      # R13/R14 position bookkeeping

Exactly-once: the merge sink is idempotent per batch (max-by-seq fold), and
Spark replays uncommitted batches from the checkpoint on restart — the
reference's mid-query restart hazard (README.md:218-221) is structurally gone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dumpr_spark.sources.cdc_json import events_to_changes, parse_event_lines, read_events_json

# The Kafka wire record shape (what spark-sql-kafka's `kafka` format yields):
# the CDC event itself rides in `value` as one JSON document per record —
# the Debezium-style topic layout (SURVEY §4.2.3). A file feed with this
# exact schema is the container-testable stand-in for a live broker.
KAFKA_RECORD_SCHEMA = (
    "key string, value string, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def _events_to_filtered_changes(
    events: DataFrame,
    id_cols: dict[str, str],
    db: str | None,
    tables: list[str] | None,
) -> DataFrame:
    from dumpr_spark.cdc.filters import filter_database, filter_tables

    if db is not None:
        events = filter_database(events, db)
    if tables:
        events = filter_tables(events, tables)
    return events_to_changes(events, id_cols)


def stream_changes(
    spark: SparkSession,
    events_path: str,
    id_cols: dict[str, str],
    db: str | None = None,
    tables: list[str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming envelope DataFrame from a JSON event-feed directory.

    Filters are plain predicates on the streaming frame — Catalyst pushes
    them to the source scan; commit-filtering is assumed done by the feed
    producer (Debezium-shaped; SURVEY §4.2.3). For raw feeds with tx markers
    use dumpr_spark.streaming.state.streaming_tx_filter first.
    """
    events = read_events_json(
        spark, events_path, streaming=True, max_files_per_trigger=max_files_per_trigger
    )
    return _events_to_filtered_changes(events, id_cols, db, tables)


def stream_changes_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    id_cols: dict[str, str],
    db: str | None = None,
    tables: list[str] | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming envelope DataFrame from a live Kafka topic — the production
    shape of R2 (the reference tails the binlog directly, binlog.clj:29-51; a
    Spark deployment tails the Debezium/Connect topic carrying the same
    events). Record value = one JSON event, parsed by the same path as the
    file feed; maxOffsetsPerTrigger is the backpressure knob (R16).

    Requires the spark-sql-kafka package on the classpath (absent in this
    container — the wire-identical file variant below covers the parse path).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    events = parse_event_lines(reader.load(), value_col="value")
    return _events_to_filtered_changes(events, id_cols, db, tables)


def stream_changes_kafka_shaped(
    spark: SparkSession,
    records_path: str,
    id_cols: dict[str, str],
    db: str | None = None,
    tables: list[str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Same pipeline as `stream_changes_kafka`, fed from files whose records
    have the Kafka wire schema (key/value/topic/partition/offset/timestamp).
    Exercises the exact value-parse path a live broker would, so swapping in
    the `kafka` format later changes only the reader line.
    """
    reader = spark.readStream.schema(KAFKA_RECORD_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = parse_event_lines(reader.json(records_path), value_col="value")
    return _events_to_filtered_changes(events, id_cols, db, tables)
