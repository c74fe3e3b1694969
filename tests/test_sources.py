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


def test_jdbc_partitioned_snapshot_against_embedded_derby(spark, tmp_path):
    """REAL JDBC round-trip (R1) against the Derby engine bundled with Spark:
    partitioned parallel range scan, remote predicate pushdown, and the
    snapshot -> envelope path. MySQL-specific bits (information_schema, SHOW
    MASTER STATUS) remain server-gated; the generic scan contract is live."""
    import json

    from dumpr_spark.cdc.envelope import snapshot_to_changes
    from dumpr_spark.operators.scale import explain_str
    from dumpr_spark.sources.jdbc import snapshot_table

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate("CREATE TABLE widgets (id INT PRIMARY KEY, name VARCHAR(50), mfg_id INT)")
    ps = conn.prepareStatement("INSERT INTO widgets VALUES (?, ?, ?)")
    for i in range(1, 101):
        ps.setInt(1, i)
        ps.setString(2, f"w{i}")
        ps.setInt(3, i % 7)
        ps.addBatch()
    ps.executeBatch()
    conn.close()

    df = snapshot_table(
        spark, url, "widgets", user="APP", password="any",  # Derby: user == default schema
        partition_column="ID", lower_bound=1, upper_bound=100, num_partitions=4,
    )
    assert df.count() == 100
    assert df.rdd.getNumPartitions() == 4  # parallel range scan, not 1 connection

    filtered = df.where(F.col("MFG_ID") == 3).select("ID", "NAME")
    plan = explain_str(filtered, "formatted")
    assert "PushedFilters" in plan and "MFG_ID" in plan  # filter reaches remote SQL
    assert filtered.count() == sum(1 for i in range(1, 101) if i % 7 == 3)

    changes = snapshot_to_changes(df, "widgets", "ID")
    row = changes.where(F.col("id") == "42").first()
    assert row["op"] == "upsert" and json.loads(row["content"])["NAME"] == "w42"


def test_corrupt_json_routes_to_dead_letter(spark, tmp_path):
    """PERMISSIVE scan with columnNameOfCorruptRecord: malformed lines land in
    the corrupt column with the raw text preserved (the batch analog of the
    in-band error channel R20) instead of failing the scan or silently
    vanishing — one bad line in a 100 TB feed must not kill the job."""
    import os

    src = str(tmp_path / "feed")
    os.makedirs(src)
    with open(os.path.join(src, "data.json"), "w") as f:
        f.write('{"a": 1, "b": "ok"}\n')
        f.write('{"a": oops not json\n')
        f.write('{"a": 3, "b": "fine"}\n')

    df = (
        spark.read.schema("a long, b string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(src)
    ).cache()  # Spark disallows filtering on ONLY the corrupt column uncached
    try:
        good = df.where(F.col("_corrupt_record").isNull())
        bad = df.where(F.col("_corrupt_record").isNotNull())
        assert {r["a"] for r in good.collect()} == {1, 3}
        bad_rows = bad.collect()
        assert len(bad_rows) == 1
        assert "oops" in bad_rows[0]["_corrupt_record"]  # raw line preserved
    finally:
        df.unpersist()
