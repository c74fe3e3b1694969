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

from dumpr_spark.sources.cdc_json import events_to_changes, read_events_json


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
    from dumpr_spark.cdc.filters import filter_database, filter_tables

    if db is not None:
        events = filter_database(events, db)
    if tables:
        events = filter_tables(events, tables)
    return events_to_changes(events, id_cols)
