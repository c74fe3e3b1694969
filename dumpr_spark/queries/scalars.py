"""Scalar-function surface: string / date / math / array / struct / JSON /
conditional (SURVEY §2.2 B+G). All JVM-side built-ins — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpr_spark.queries.base import eps_round, query, t

import functools as _functools


@_functools.lru_cache(maxsize=None)
def _scratch_dir(name: str) -> str:
    """Per-process scratch dir for source round-trip queries: created ONCE
    per process via mkdtemp (unpredictable, owner-only — no cross-user
    collision or symlink hazard on shared /tmp), reused by every later
    invocation in the same process (bench passes, oracle walks) so repeated
    runs overwrite instead of accumulating."""
    import tempfile

    return tempfile.mkdtemp(prefix=f"dumpr_{name}_")



@query(
    "scalar_string",
    """
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_brand) AS lo_brand,
           substr(p_type, 1, 5) AS type5,
           CAST(length(p_name) AS INT) AS name_len,
           p_brand || '/' || p_type AS brand_type,
           trim(' ' || p_name || ' ') AS trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_extract(p_brand, '[0-9]+') AS brand_num,
           regexp_replace(p_type, '[aeiou]', '_', 'g') AS devoweled,
           replace(p_brand, '#', '-') AS brand_dash
    FROM part ORDER BY p_partkey
    """,
    tags=("scalar",),
)
def scalar_string(spark, sf_dir):
    """concat/substring/case/trim/pad/split/regex — charset+name munging family
    the reference needs for text decode (R10, stream.clj:214-236)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("lo_brand"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract(F.col("p_brand"), "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace(F.col("p_type"), "[aeiou]", "_").alias("devoweled"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dash"),
    ).orderBy("p_partkey")


@query(
    "scalar_datetime",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_95,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(epoch_ms(o_orderdate) / 1000 AS BIGINT) AS unix_sec
    FROM orders ORDER BY o_orderkey
    """,
    tags=("scalar",),
)
def scalar_datetime(spark, sf_dir):
    """year/month/day/trunc/diff/add/unix — timestamp normalize family (R11)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_95"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        (F.unix_millis(F.col("o_orderdate").cast("timestamp")) / 1000).cast("long").alias("unix_sec"),
    ).orderBy("o_orderkey")


@query(
    "scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_extendedprice - 30000), 2) AS dist_from_30k,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(l_partkey % 7 AS BIGINT) AS pk_mod7,
           ROUND(power(l_discount + 1, 2), 6) AS disc_sq,
           ROUND(sqrt(l_extendedprice), 4) AS price_sqrt,
           ROUND(ln(l_extendedprice + 1), 6) AS price_ln,
           ROUND(exp(l_discount), 6) AS disc_exp
    FROM lineitem
    WHERE l_orderkey < 1000
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar",),
)
def scalar_math(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("dist_from_30k"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        (F.col("l_partkey") % 7).cast("long").alias("pk_mod7"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 6).alias("disc_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "scalar_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_bucket,
           COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS segment,
           ROUND(GREATEST(c_acctbal, 0.0) + 1e-9, 2) AS bal_pos,
           ROUND(LEAST(c_acctbal, 1000.0) + 1e-9, 2) AS bal_capped,
           ROUND(CAST(c_acctbal AS DOUBLE) + 1e-9, 2) AS bal_dec,
           CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS key_roundtrip
    FROM customer ORDER BY c_custkey
    """,
    tags=("scalar",),
)
def scalar_conditional(spark, sf_dir):
    """CASE/COALESCE/NULLIF/GREATEST/LEAST + CAST — the condp-dispatch family
    (R3, events.clj:84-89; (or id-fn pk) table_schema.clj:50-51)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CAR")).alias("segment"),
        eps_round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal_pos"),
        eps_round(F.least(F.col("c_acctbal"), F.lit(1000.0)), 2).alias("bal_capped"),
        eps_round(F.col("c_acctbal").cast("double"), 2).alias("bal_dec"),
        F.col("c_custkey").cast("string").cast("long").alias("key_roundtrip"),
    ).orderBy("c_custkey")


@query(
    "scalar_array",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           string_split(text, ' ')[1] AS first_tok,
           CAST(list_contains(string_split(text, ' '), 'spark') AS BOOLEAN) AS has_spark,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3,
           array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 50), ' '))), ',') AS sorted_head_toks
    FROM documents ORDER BY doc_id
    """,
    tags=("scalar", "array"),
)
def scalar_array(spark, sf_dir):
    """explode-free array ops: size/contains/slice/sort/distinct over tokens
    (multi-row explode family is exercised by the CDC path, R10)."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        toks.getItem(0).alias("first_tok"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.substring(F.col("text"), 1, 50), " "))), ","
        ).alias("sorted_head_toks"),
    ).orderBy("doc_id")


@query(
    "scalar_array_fold",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(list_sum(embedding) AS DOUBLE), 4) AS vec_sum,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS vec_max,
           ROUND(sqrt(list_sum(list_transform(embedding, x -> x * x))), 4) AS l2_norm
    FROM embeddings ORDER BY vec_id
    """,
    tags=("scalar", "array", "llm"),
)
def scalar_array_fold(spark, sf_dir):
    """aggregate (fold) + transform over array<float> — the embedding math
    primitives (SURVEY §2.2-J)."""
    e = t(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vec_sum = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x)
    sq_sum = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x)
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(vec_sum, 4).alias("vec_sum"),
        F.round(F.array_max(dbl), 4).alias("vec_max"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
    ).orderBy("vec_id")


@query(
    "scalar_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events ORDER BY event_id
    """,
    tags=("scalar", "json"),
)
def scalar_json(spark, sf_dir):
    """get_json_object — the CDC envelope's content access primitive."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    ).orderBy("event_id")


@query(
    "scalar_json_struct",
    """
    SELECT event_id, k_val * 2 AS k_doubled
    FROM (SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val FROM events)
    WHERE k_val > 50
    ORDER BY event_id
    """,
    tags=("scalar", "json"),
)
def scalar_json_struct(spark, sf_dir):
    """from_json into a typed struct, then field access + predicate."""
    e = t(spark, sf_dir, "events")
    parsed = e.select(
        "event_id", F.from_json("props", "k BIGINT").alias("p")
    ).select("event_id", F.col("p").getField("k").alias("k_val"))
    return (
        parsed.where(F.col("k_val") > 50)
        .select("event_id", (F.col("k_val") * 2).alias("k_doubled"))
        .orderBy("event_id")
    )


@query(
    "scalar_struct_map",
    """
    SELECT n_nationkey,
           {'name': n_name, 'region': n_regionkey}.name AS s_name,
           {'name': n_name, 'region': n_regionkey}.region AS s_region
    FROM nation ORDER BY n_nationkey
    """,
    tags=("scalar",),
)
def scalar_struct_map(spark, sf_dir):
    """struct build + field access (zipmap/tuple family, R10)."""
    n = t(spark, sf_dir, "nation")
    s = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    return n.select(
        "n_nationkey",
        s.getField("name").alias("s_name"),
        s.getField("region").alias("s_region"),
    ).orderBy("n_nationkey")


@query(
    "scalar_encode_decode",
    """
    SELECT doc_id,
           decode(encode(text)) AS roundtrip,
           base64(encode(substr(text, 1, 12))) AS b64_head,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents ORDER BY doc_id
    """,
    tags=("scalar", "string"),
)
def scalar_encode_decode(spark, sf_dir):
    """Charset encode/decode round-trip + base64 — the R10 text-column decode
    surface (stream.clj:214-231: binlog text arrives as bytes, decoded by the
    column character set)."""
    d = t(spark, sf_dir, "documents")
    enc = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.decode(enc, "UTF-8").alias("roundtrip"),
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("b64_head"),
        F.length(enc).cast("long").alias("n_bytes"),
    ).orderBy("doc_id")


@query(
    "source_csv_scan",
    """
    SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n_name) AS first_name
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    tags=("source", "csv"),
)
def source_csv_scan(spark, sf_dir):
    """CSV batch source under the oracle gate (SURVEY §2.2-A): the parquet
    table is round-tripped through CSV with an explicit schema (inference is
    the anti-pattern at scale: a second full scan + type drift), then
    aggregated — results must equal the parquet-direct oracle."""
    from dumpr_spark.sources.files import read_csv

    src = t(spark, sf_dir, "nation")
    path = _scratch_dir("csv_nation") + "/data"
    src.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, schema=src.schema)
    return (
        back.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"), F.min("n_name").alias("first_name"))
        .orderBy("n_regionkey")
    )


@query(
    "scalar_bitwise",
    """
    SELECT p_partkey,
           CAST(p_size & 15 AS INT) AS lo_nibble,
           CAST(p_size | 64 AS INT) AS with_flag,
           CAST(xor(p_size, 255) AS INT) AS flipped,
           CAST(p_size << 2 AS INT) AS shl,
           CAST(p_size >> 1 AS INT) AS shr,
           CAST(bit_count(CAST(p_size AS BIGINT)) AS INT) AS popcount
    FROM part WHERE p_partkey <= 500 ORDER BY p_partkey
    """,
    tags=("scalar", "bitwise"),
)
def scalar_bitwise(spark, sf_dir):
    """Bitwise scalar family (the SimHash/bit-packing primitives as declared
    surface): and/or/xor, shifts, popcount."""
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        sz.bitwiseAND(F.lit(15)).cast("int").alias("lo_nibble"),
        sz.bitwiseOR(F.lit(64)).cast("int").alias("with_flag"),
        sz.bitwiseXOR(F.lit(255)).cast("int").alias("flipped"),
        F.shiftleft(sz, 2).cast("int").alias("shl"),
        F.shiftright(sz, 1).cast("int").alias("shr"),
        F.bit_count(sz.cast("bigint")).cast("int").alias("popcount"),
    ).orderBy("p_partkey")


@query(
    "source_orc_scan",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c_acctbal) + 1e-9, 2) AS total_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("source", "orc"),
)
def source_orc_scan(spark, sf_dir):
    """ORC batch source/sink (SURVEY §2.2-A format coverage): round-trip the
    customer table through ORC (Spark-native columnar alternative to
    parquet, same pushdown/pruning machinery) and aggregate — results must
    equal the parquet-direct oracle. snappy-by-default, schema preserved."""
    src = t(spark, sf_dir, "customer")
    path = _scratch_dir("orc_customer") + "/data"
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            eps_round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "source_jsonl_scan",
    """
    SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(AVG(s_acctbal) + 1e-9, 3) AS avg_bal
    FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
    """,
    tags=("source", "json"),
)
def source_jsonl_scan(spark, sf_dir):
    """JSON-lines batch source under the oracle gate (SURVEY §2.2-A):
    round-trip supplier through newline-delimited JSON with an explicit
    schema (inference = a second full scan at 100 TB, never in a pipeline)
    and aggregate against the parquet-direct oracle."""
    from dumpr_spark.sources.files import read_json

    src = t(spark, sf_dir, "supplier")
    path = _scratch_dir("json_supplier") + "/data"
    src.write.mode("overwrite").json(path)
    back = read_json(spark, path, schema=src.schema)
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            eps_round(F.avg("s_acctbal"), 3).alias("avg_bal"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "scalar_higher_order",
    """
    WITH base AS (
      SELECT p_partkey, generate_series(1, p_size % 8 + 3) AS arr
      FROM part WHERE p_partkey <= 300
    )
    SELECT p_partkey,
           array_to_string(list_filter(arr, x -> x % 2 = 0), ',') AS evens,
           len(list_filter(arr, x -> x > 5)) > 0 AS has_big,
           len(list_filter(arr, x -> NOT (x < 9))) = 0 AS all_small,
           array_to_string(list_transform(arr, (x, i) -> x * arr[len(arr) - i + 1]), ',') AS prods,
           array_to_string(list_transform(arr, (x, i) -> x * i), ',') AS idx_weighted,
           CAST(list_reduce(arr, (a, x) -> a + x) AS BIGINT) AS total
    FROM base ORDER BY p_partkey
    """,
    tags=("scalar", "array", "higher-order"),
)
def scalar_higher_order(spark, sf_dir):
    """Higher-order array functions (lambda surface): filter / exists /
    forall / zip_with / transform-with-index / fold. All JVM lambda
    expressions inside whole-stage codegen — the building blocks the dedup
    and winnowing operators compose. Index bases differ (Spark 0-based,
    DuckDB 1-based) and Spark's fold takes an init where DuckDB's starts at
    element 1 — the formulations below reconcile both."""
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 300)
    base = p.select(
        "p_partkey", F.sequence(F.lit(1), F.col("p_size") % 8 + 3).alias("arr")
    )
    arr = F.col("arr")
    # Array-typed result columns are joined to strings in the final
    # projection on BOTH engines: the comparison harness sorts rows by every
    # column and raw lists are unhashable there (same pattern as
    # scalar_array's first3/sorted_head_toks). The lambda surface under test
    # is unchanged — stringification happens after the higher-order ops.
    return base.select(
        "p_partkey",
        F.array_join(F.filter(arr, lambda x: x % 2 == 0), ",").alias("evens"),
        F.exists(arr, lambda x: x > 5).alias("has_big"),
        F.forall(arr, lambda x: x < 9).alias("all_small"),
        F.array_join(
            F.zip_with(arr, F.reverse(arr), lambda a, b: a * b), ","
        ).alias("prods"),
        F.array_join(
            F.transform(arr, lambda x, i: x * (i + 1)), ","
        ).alias("idx_weighted"),
        F.aggregate(
            F.slice(arr, 2, F.size(arr) - 1), F.element_at(arr, 1), lambda a, x: a + x
        ).cast("long").alias("total"),
    ).orderBy("p_partkey")


@query(
    "scalar_interval_arith",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 45 DAY AS TIMESTAMP) AS due_date,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS quarter_out,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                AS BIGINT) AS days_to_y2k,
           CAST(datediff('month', date_trunc('month', o_orderdate),
                         TIMESTAMP '2000-01-01 00:00:00') AS BIGINT) AS months_to_y2k
    FROM orders WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def scalar_interval_arith(spark, sf_dir):
    """Interval arithmetic family: day/month interval addition (calendar-
    aware, month-end clamped identically by both engines), month truncation,
    and day/whole-month difference — the retention/due-date arithmetic every
    events pipeline needs. Narrow projection, pushes through the scan."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    y2k = F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")).alias("due_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("quarter_out"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.datediff(y2k, F.col("o_orderdate")).cast("long").alias("days_to_y2k"),
        F.months_between(y2k, F.date_trunc("month", "o_orderdate"))
        .cast("long").alias("months_to_y2k"),
    ).orderBy("o_orderkey")


@query(
    "source_xml_scan",
    """
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(p_size) AS BIGINT) AS total_size,
           MIN(p_type) AS first_type
    FROM part WHERE p_partkey <= 400 GROUP BY p_brand ORDER BY p_brand
    """,
    tags=("source", "xml"),
)
def source_xml_scan(spark, sf_dir):
    """XML batch source/sink (SURVEY §2.2-A format coverage; Spark 4 ships
    the XML data source natively — no external package): round-trip a part
    slice through row-tagged XML with an EXPLICIT schema on read (inference
    is a second full scan at 100 TB; XML inference is also type-lossy) and
    aggregate — results must equal the parquet-direct oracle. XML is the
    feed format of legacy enterprise exports, the usual first hop of a CDC
    backfill."""
    src = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 400).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    path = _scratch_dir("xml_part") + "/data"
    src.write.format("xml").option("rowTag", "part").mode("overwrite").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "part")
        .schema(src.schema)
        .load(path)
    )
    return (
        back.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("p_size").alias("total_size"),
            F.min("p_type").alias("first_type"),
        )
        .orderBy("p_brand")
    )


@query(
    "scalar_variant",
    """
    WITH j AS (
      SELECT event_id,
             '{"meta": {"id": ' || event_id || ', "tags": ["base", "' || event_type ||
             '"]}, "k": ' || COALESCE(json_extract_string(props, '$.k'), 'null') || '}'
               AS doc
      FROM events
    )
    SELECT event_id,
           CAST(json_extract_string(doc, '$.meta.id') AS BIGINT) AS meta_id,
           json_extract_string(doc, '$.meta.tags[1]') AS tag1,
           CAST(json_extract_string(doc, '$.k') AS BIGINT) AS k_val,
           json_extract_string(doc, '$.missing.path') AS missing_val
    FROM j ORDER BY event_id
    """,
    tags=("scalar", "json", "variant"),
)
def scalar_variant(spark, sf_dir):
    """Spark 4 VARIANT semi-structured access: parse_json into the binary
    variant encoding once, then try_variant_get path extraction (object
    field, array index, typed cast, absent path -> NULL). The Spark side
    runs the real VariantType path — the 100 TB win over per-path
    get_json_object is that the document parses ONCE into a binary form
    all subsequent path reads share, instead of re-parsing the JSON text
    per extracted column. The oracle reads the same constructed document
    with DuckDB's JSON path functions — the values, not the encoding, are
    the contract. Pure narrow projection, zero shuffle."""
    e = t(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"meta": {"id": '),
        F.col("event_id").cast("string"),
        F.lit(', "tags": ["base", "'),
        F.col("event_type"),
        F.lit('"]}, "k": '),
        F.coalesce(F.get_json_object("props", "$.k"), F.lit("null")),
        F.lit("}"),
    )
    v = F.parse_json(doc)
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.meta.id", "long").alias("meta_id"),
        F.try_variant_get(v, "$.meta.tags[1]", "string").alias("tag1"),
        F.try_variant_get(v, "$.k", "long").alias("k_val"),
        F.try_variant_get(v, "$.missing.path", "string").alias("missing_val"),
    ).orderBy("event_id")
