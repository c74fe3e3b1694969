"""R9: schema enrichment + DDL-triggered cache invalidation.

The reference clears its schema cache when a binlog query event matches the
DDL regex (stream.clj:204-212, events.clj:88) so subsequent row events decode
with the post-DDL schema. These tests drive the Spark re-expression: a
SchemaCatalog caching StructTypes, invalidated mid-STREAM by an alter-table
event, with the new column visible in typed views of later batches.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import StringType, StructField, StructType

pytestmark = pytest.mark.streaming


def test_classify_ddl_regex():
    from dumpr_spark.cdc.schema_catalog import classify_ddl

    assert classify_ddl("ALTER TABLE widgets ADD COLUMN color text") == ("alter-table", "widgets")
    assert classify_ddl("  alter table `shop`.`widgets` drop column v") == ("alter-table", "widgets")
    assert classify_ddl("CREATE TABLE gadgets (id int)") == ("create-table", "gadgets")
    assert classify_ddl("DROP TABLE old_stuff") == ("drop-table", "old_stuff")
    assert classify_ddl("BEGIN") is None
    assert classify_ddl("INSERT INTO widgets VALUES (1)") is None
    assert classify_ddl(None) is None


def test_catalog_caches_and_invalidates():
    from dumpr_spark.cdc.schema_catalog import SchemaCatalog

    fetches = []

    def fetch(table):
        fetches.append(table)
        return StructType([StructField("id", StringType())])

    cat = SchemaCatalog(fetch)
    cat.schema_for("w")
    cat.schema_for("w")
    assert fetches == ["w"]  # cached
    cat.invalidate("w")
    cat.schema_for("w")
    assert fetches == ["w", "w"]  # refetched after invalidation
    cat.invalidate()  # wholesale clear (the reference's shape)
    cat.schema_for("w")
    assert len(fetches) == 3


def test_ddl_event_invalidates_mid_stream(spark, tmp_path):
    """An ALTER TABLE event arriving in micro-batch 2 must flip the catalog:
    batch-1 rows decode with the old schema, batch-2+ rows see the new column.
    The schema source is mutable (stands in for information_schema, which the
    test mutates between batches exactly when the DDL event is emitted)."""
    from dumpr_spark.cdc.schema_catalog import SchemaCatalog, TypedViewSink

    src = str(tmp_path / "ddl_src")
    out = str(tmp_path / "ddl_out")
    ckpt = str(tmp_path / "ddl_ckpt")
    os.makedirs(src, exist_ok=True)

    # mutable "information_schema": table -> column list, mutated by the test
    live_schema = {"widgets": ["id", "v"]}
    fetch_count = {"n": 0}

    def fetch(table):
        fetch_count["n"] += 1
        return StructType([StructField(c, StringType()) for c in live_schema[table]])

    catalog = SchemaCatalog(fetch)
    sink = TypedViewSink(catalog, out, id_cols={"widgets": "id"})

    def write_batch(events, name):
        with open(os.path.join(src, name), "w") as f:
            for e in events:
                f.write(json.dumps(e) + "\n")

    def run():
        from dumpr_spark.sources.cdc_json import read_events_json

        q = (
            read_events_json(spark, src, streaming=True)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: pre-DDL rows (schema: id, v)
    write_batch([
        {"event_type": "write", "db": "shop", "tbl": "widgets", "ts": "2026-01-01T00:00:00Z",
         "next_position": 1, "rows": [{"id": "1", "v": "a"}], "seq": 1},
    ], "b1.json")
    run()
    got1 = spark.read.parquet(f"{out}/widgets")
    # payload `id` keeps its name; the envelope id is prefixed
    assert sorted(got1.columns) == sorted(["op", "_cdc_id", "seq", "ts", "id", "v"])

    # the DDL lands: mutate the backing schema AND emit the alter event —
    # batch 2 carries the raw SQL form (regex-classified, events.clj:88)
    live_schema["widgets"] = ["id", "v", "color"]
    write_batch([
        {"event_type": "query", "db": "shop", "tbl": None, "ts": "2026-01-01T00:01:00Z",
         "next_position": 2, "query": "ALTER TABLE widgets ADD COLUMN color text", "seq": 2},
        {"event_type": "write", "db": "shop", "tbl": "widgets", "ts": "2026-01-01T00:02:00Z",
         "next_position": 3, "rows": [{"id": "2", "v": "b", "color": "red"}], "seq": 3},
    ], "b2.json")
    run()

    # evolved table: batch-1 files lack the new column -> mergeSchema union
    got2 = spark.read.option("mergeSchema", "true").parquet(f"{out}/widgets")
    assert "color" in got2.columns
    by_id = {r["id"]: r.asDict() for r in got2.collect()}
    assert by_id["2"]["color"] == "red"
    # pre-DDL row re-read under the union'd schema: new column is NULL
    assert by_id["1"]["color"] is None
    # the catalog actually refetched (old cached schema was invalidated)
    assert fetch_count["n"] >= 2


def test_preclassified_alter_event_invalidates(spark):
    """The producer-classified shape (event_type='alter-table', tbl set) also
    invalidates — both shapes the reference distinguishes (events.clj:84-89)."""
    from dumpr_spark.cdc.schema_catalog import SchemaCatalog
    from dumpr_spark.sources.cdc_json import EVENT_SCHEMA

    fetches = []
    cat = SchemaCatalog(lambda t: fetches.append(t) or StructType([]))
    cat.schema_for("widgets")
    events = spark.createDataFrame(
        [("alter-table", "shop", "widgets", None, None, None, None, None, 5)],
        EVENT_SCHEMA,
    )
    assert cat.invalidate_for_ddl(events) == ["widgets"]
    cat.schema_for("widgets")
    assert fetches == ["widgets", "widgets"]
