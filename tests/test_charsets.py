"""Per-column charset decode (R10 tail, stream.clj:214-231): text columns
carry their MySQL charset; bytes must decode per column, not assumed UTF-8."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_native_and_codec_paths_roundtrip(spark):
    from dumpr_spark.cdc.charsets import decode_row_columns

    ru = "привет мир"          # cp1251-encodable
    de = "größe—naïve €"       # cp1252 (euro + em dash are the 0x80-0x9F traps)
    en = "plain ascii"
    rows = [(1, en.encode("utf-8"), ru.encode("cp1251"), de.encode("cp1252"))]
    df = spark.createDataFrame(rows, "id long, c_utf8 binary, c_ru binary, c_de binary")
    out = decode_row_columns(
        df, {"c_utf8": "utf8mb4", "c_ru": "cp1251", "c_de": "latin1"}
    ).collect()[0]
    assert out["c_utf8"] == en
    assert out["c_ru"] == ru
    # the MySQL-latin1-is-cp1252 case: ISO-8859-1 would turn — and € into C1 controls
    assert out["c_de"] == de


def test_mysql_latin1_is_cp1252_not_iso8859(spark):
    from dumpr_spark.cdc.charsets import decode_text_column

    payload = "a—b".encode("cp1252")  # em dash = 0x97, undefined in ISO-8859-1 text
    df = spark.createDataFrame([(payload,)], "b binary")
    got = df.select(decode_text_column("b", "latin1").alias("s")).first()["s"]
    assert got == "a—b"


def test_unknown_charset_raises_at_plan_time(spark):
    from dumpr_spark.cdc.charsets import decode_text_column

    with pytest.raises(ValueError, match="unknown MySQL charset"):
        decode_text_column("b", "klingon")


def test_null_bytes_stay_null(spark):
    from dumpr_spark.cdc.charsets import decode_text_column

    df = spark.createDataFrame([(None,), ("ok".encode("cp1251"),)], "b binary")
    got = [r["s"] for r in df.select(decode_text_column("b", "cp1251").alias("s"))
           .collect()]
    assert got == [None, "ok"]


def test_charset_map_from_catalog(spark):
    from dumpr_spark.cdc.charsets import charset_map_from_catalog

    catalog = spark.createDataFrame(
        [
            ("widgets", "id", 1, "bigint", None, "PRI"),
            ("widgets", "name", 2, "varchar", "utf8mb4", ""),
            ("widgets", "legacy_note", 3, "varchar", "latin1", ""),
            ("gadgets", "g", 1, "varchar", "cp1251", ""),
        ],
        "TABLE_NAME string, COLUMN_NAME string, ORDINAL_POSITION int, "
        "DATA_TYPE string, CHARACTER_SET_NAME string, COLUMN_KEY string",
    )
    assert charset_map_from_catalog(catalog, "widgets") == {
        "name": "utf8mb4", "legacy_note": "latin1"
    }
