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

from dumpr_spark.sources.cdc_json import (
    debezium_to_changes,
    events_to_changes,
    parse_debezium_lines,
    parse_event_lines,
    read_events_json,
)

# The Kafka wire record shape (what spark-sql-kafka's `kafka` format yields):
# the CDC event itself rides in `value` as one JSON document per record —
# the Debezium-style topic layout (SURVEY §4.2.3). A file feed with this
# exact schema is the container-testable stand-in for a live broker.
KAFKA_RECORD_SCHEMA = (
    "key string, value string, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)

# Source liveness/retry knobs — the reference's conn-param defaults
# (core.clj:16-20: stream-keepalive-interval 60000, stream-keepalive-timeout
# 3000, initial-connection-timeout 3000), re-expressed for a Kafka consumer.
# The reference's BinaryLogClient keepalive (binlog.clj:44-51) probes the
# connection every `interval` ms and re-connects with a per-attempt `timeout`;
# the Kafka client has the same contract under different names:
#
#   stream_keepalive_interval  -> kafka.reconnect.backoff.max.ms   (ceiling on
#       the silent gap before the consumer re-probes a dead broker — the
#       client retries forever, at most this far apart)
#   stream_keepalive_timeout   -> kafka.socket.connection.setup.timeout.max.ms
#       (ceiling on the per-RECONNECT-attempt connect budget — the same
#       role the reference's keepalive timeout plays for its reconnect
#       probes. Deliberately NOT kafka.request.timeout.ms: that would put a
#       3 s expiry on every in-flight fetch/metadata request, 10x below the
#       Kafka default of 30 s, and declare a merely-loaded broker dead)
#   initial_connection_timeout -> kafka.socket.connection.setup.timeout.ms
#       (initial per-attempt TCP connect budget, = BinaryLogClient.connect(timeout))
#
# Restart policy (R15): WITHIN a run the Kafka client reconnects by itself
# under the knobs above — the streaming query does not fail on a broker
# blip. ACROSS runs (query killed, executor loss beyond Spark's own retry),
# restart the writeStream with the same checkpointLocation: offsets + sink
# state resume exactly-once (test_stream_ingest_kafka_shaped_records).
CONN_PARAM_DEFAULTS = {
    "stream_keepalive_interval": 60_000,
    "stream_keepalive_timeout": 3_000,
    "initial_connection_timeout": 3_000,
}


def kafka_conn_options(conn_params: dict | None = None) -> dict[str, str]:
    """`kafka.*` reader options for the reference's connection knobs.

    Unknown keys raise — the same fail-fast contract as the reference's
    config schema validation (core.clj:31-34 validate-conf).
    """
    params = dict(CONN_PARAM_DEFAULTS)
    unknown = set(conn_params or ()) - set(params)
    if unknown:
        raise ValueError(f"unknown conn_params: {sorted(unknown)}; "
                         f"expected {sorted(params)}")
    params.update(conn_params or {})
    return {
        "kafka.reconnect.backoff.max.ms": str(params["stream_keepalive_interval"]),
        "kafka.socket.connection.setup.timeout.max.ms": str(params["stream_keepalive_timeout"]),
        "kafka.socket.connection.setup.timeout.ms": str(params["initial_connection_timeout"]),
    }


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
    conn_params: dict | None = None,
) -> DataFrame:
    """Streaming envelope DataFrame from a live Kafka topic — the production
    shape of R2 (the reference tails the binlog directly, binlog.clj:29-51; a
    Spark deployment tails the Debezium/Connect topic carrying the same
    events). Record value = one JSON event, parsed by the same path as the
    file feed; maxOffsetsPerTrigger is the backpressure knob (R16);
    conn_params carries the reference's keepalive/retry knobs
    (CONN_PARAM_DEFAULTS above — see there for the restart policy).

    Requires the spark-sql-kafka package on the classpath (absent in this
    container — the wire-identical file variant below covers the parse path).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for opt, val in kafka_conn_options(conn_params).items():
        reader = reader.option(opt, val)
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
    conn_params: dict | None = None,
) -> DataFrame:
    """Same pipeline as `stream_changes_kafka`, fed from files whose records
    have the Kafka wire schema (key/value/topic/partition/offset/timestamp).
    Exercises the exact value-parse path a live broker would, so swapping in
    the `kafka` format later changes only the reader line.

    conn_params is validated exactly as the live variant validates it (a
    file source has no connection to keep alive, so the options are checked
    and dropped) — a config typo fails identically in test and production.
    """
    kafka_conn_options(conn_params)  # validate; no connection to apply them to
    reader = spark.readStream.schema(KAFKA_RECORD_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = parse_event_lines(reader.json(records_path), value_col="value")
    return _events_to_filtered_changes(events, id_cols, db, tables)


def stream_changes_debezium(
    spark: SparkSession,
    records_path: str,
    id_cols: dict[str, str],
    db: str | None = None,
    tables: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    conn_params: dict | None = None,
) -> DataFrame:
    """Streaming envelope DataFrame from a Debezium-format feed — the actual
    production wire shape SURVEY §1.4/§4.2 names. Records have the Kafka wire
    schema; each `value` is a Debezium envelope (`payload.before/after/op/
    ts_ms/source.{db,table,file,pos,row}`), adapted to the engine envelope by
    sources.cdc_json.debezium_to_changes (op/ts/position/seq mapping there).

    No transaction filter on this path: Debezium publishes only committed
    transactions (the raw-binlog tx markers the reference filters,
    stream.clj:22-54, never reach the topic). db/tables filters are plain
    predicates on the parsed payload — pushed into the scan by Catalyst.
    Swap the file reader for `format("kafka")` + `kafka_conn_options` to go
    live, exactly as stream_changes_kafka does for the engine-JSON topic.
    """
    from pyspark.sql import functions as F

    kafka_conn_options(conn_params)  # validate; no connection to apply them to
    reader = spark.readStream.schema(KAFKA_RECORD_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    payloads = parse_debezium_lines(reader.json(records_path), value_col="value")
    if db is not None:
        payloads = payloads.where(F.col("source.db") == db)
    if tables:
        payloads = payloads.where(F.col("source.table").isin(list(tables)))
    return debezium_to_changes(payloads, id_cols)
