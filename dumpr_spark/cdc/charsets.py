"""Per-column character-set decode (R10 tail: stream.clj:214-231).

The reference decodes each text column's bytes with the column's charset
from the table schema (MySQL columns declare their own charsets; a binlog
row image is raw bytes). The Spark re-expression: binary columns -> string
via the column's charset, driven by the same information_schema catalog
(CHARACTER_SET_NAME, sources/jdbc.py:fetch_information_schema).

Two decode paths:
- JVM-native (`F.decode`) for the charsets Spark's expression accepts —
  stays in whole-stage codegen, zero Python.
- Arrow-batched pandas UDF with Python codecs for the rest (cp1251, cp1252,
  koi8-r, ...) — the declared slow path, per-column opt-in, batch-vectorized.

MySQL charset-name gotcha, handled explicitly: MySQL's ``latin1`` is actually
cp1252 (it decodes 0x80-0x9F to Windows punctuation, not C1 controls), so it
maps to the Python ``cp1252`` codec, NOT ISO-8859-1.
"""

from __future__ import annotations

import codecs

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

# Charsets Spark's decode() expression accepts (JVM-side fast path).
_SPARK_NATIVE = {
    "ascii": "US-ASCII",
    "utf8": "UTF-8",
    "utf8mb3": "UTF-8",
    "utf8mb4": "UTF-8",
    "utf16": "UTF-16",
    "ucs2": "UTF-16",  # MySQL ucs2 is BMP-only UTF-16
}

# MySQL charset name -> Python codec (pandas-UDF fallback path).
_MYSQL_TO_PYTHON = {
    "latin1": "cp1252",  # MySQL latin1 IS cp1252, not ISO-8859-1
    "latin2": "iso8859-2",
    "cp1250": "cp1250",
    "cp1251": "cp1251",
    "cp1256": "cp1256",
    "cp1257": "cp1257",
    "koi8r": "koi8-r",
    "koi8u": "koi8-u",
    "greek": "iso8859-7",
    "hebrew": "iso8859-8",
    "cp850": "cp850",
    "cp852": "cp852",
    "cp866": "cp866",
    "sjis": "shift_jis",
    "ujis": "euc-jp",
    "euckr": "euc-kr",
    "gbk": "gbk",
    "gb2312": "gb2312",
    "big5": "big5",
    "tis620": "tis-620",
}


def decode_text_column(col: Column | str, mysql_charset: str) -> Column:
    """Binary column -> string using the MySQL column charset.

    JVM `decode` where the charset allows; otherwise an Arrow-batched decode
    in Python. Raises on charsets neither path knows (fail loud beats
    mojibake)."""
    c = F.col(col) if isinstance(col, str) else col
    cs = (mysql_charset or "").lower()
    if cs in _SPARK_NATIVE:
        return F.decode(c, _SPARK_NATIVE[cs])
    codec = _MYSQL_TO_PYTHON.get(cs)
    if codec is None:
        raise ValueError(
            f"unknown MySQL charset {mysql_charset!r}: add it to _MYSQL_TO_PYTHON "
            "or decode upstream"
        )
    codecs.lookup(codec)  # fail at plan time, not inside the executor

    @pandas_udf("string")
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(lambda b: b.decode(codec) if b is not None else None)

    return _decode(c)


def charset_map_from_catalog(catalog: DataFrame, table: str) -> dict[str, str]:
    """column -> charset for one table, from an information_schema.COLUMNS
    frame (sources/jdbc.py:fetch_information_schema). Non-text columns have
    NULL CHARACTER_SET_NAME and are omitted. The catalog is tiny (one row per
    column) — collecting it to the driver is the point: it parametrizes the
    decode plan, it is not data."""
    rows = (
        catalog.where(
            (F.col("TABLE_NAME") == table) & F.col("CHARACTER_SET_NAME").isNotNull()
        )
        .select("COLUMN_NAME", "CHARACTER_SET_NAME")
        .collect()
    )
    return {r["COLUMN_NAME"]: r["CHARACTER_SET_NAME"] for r in rows}


def decode_row_columns(df: DataFrame, charset_map: dict[str, str]) -> DataFrame:
    """Decode every binary column named in charset_map to string, in place.
    Columns not named pass through untouched."""
    out = df
    for col, cs in charset_map.items():
        out = out.withColumn(col, decode_text_column(col, cs))
    return out
