"""Batch source coverage (SURVEY §2.2-A): CSV and JSON scans round-trip the
parquet testdata losslessly when a schema is supplied, and the JDBC module's
non-DB helpers behave. The live-MySQL paths (snapshot_table against a real
server) are interface-pinned here and exercised only where a server exists —
the reference has the same split (CI spins up mysql:8.0.35)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumpr_spark.sources.files import load_table, read_csv, read_json


def _nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    path = str(tmp_path / "nation_csv")
    src.write.option("header", "true").csv(path)
    back = read_csv(spark, path, schema=src.schema)
    assert back.schema == src.schema
    assert sorted(back.collect()) == sorted(src.collect())


def test_csv_infer_schema(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    path = str(tmp_path / "nation_csv2")
    src.write.option("header", "true").csv(path)
    back = read_csv(spark, path)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    path = str(tmp_path / "nation_json")
    src.write.json(path)
    back = read_json(spark, path, schema=src.schema)
    assert back.schema == src.schema
    assert sorted(back.collect()) == sorted(src.collect())


def test_events_nanos_normalized(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    assert ev.where(F.col("ts").isNull()).count() == 0


def test_jdbc_helpers_no_server():
    from dumpr_spark.sources.jdbc import mysql_url

    url = mysql_url("h", 3306, "db")
    assert url.startswith("jdbc:mysql://h:3306/db")
    # reference-mandated connection semantics (query.clj:15, README.md:146-147)
    assert "zeroDateTimeBehavior=convertToNull" in url
    assert "tinyInt1isBit=false" in url


def test_jdbc_snapshot_requires_server(spark):
    from dumpr_spark.sources.jdbc import snapshot_table

    with pytest.raises(Exception):
        snapshot_table(
            spark, "jdbc:mysql://127.0.0.1:1/nope", "t",
            user="u", password="p", num_partitions=2,
        ).collect()
