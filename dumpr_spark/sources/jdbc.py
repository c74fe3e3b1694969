"""JDBC snapshot source — the reference's initial table load (R1).

Reference: blocking single-threaded ``SELECT * FROM t`` per table
(/root/reference/src/dumpr/query.clj:45-64) with convertToNull zero-dates and
tinyInt1isBit=false (query.clj:15, README.md:146-147). Spark re-expression:
``spark.read.jdbc`` with a *partitioned* scan — numPartitions parallel range
queries on the PK — which is what makes a 100 TB initial load feasible at all
(the reference is single-connection by design).

The generic scan contract (partitioned parallel read, remote predicate
pushdown, snapshot->envelope) is tested live against the Derby engine bundled
with Spark (tests/test_sources.py); the MySQL-specific helpers
(information_schema catalog, SHOW MASTER STATUS) remain server-gated, with the
Parquet feed substituting in tests (SURVEY §7.2 step 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Reference connection options, translated (query.clj:15):
#   zeroDateTimeBehavior=convertToNull -> NULL timestamps for zero dates
#   tinyInt1isBit=false                -> tinyint(1) stays numeric
MYSQL_URL_OPTIONS = "zeroDateTimeBehavior=convertToNull&tinyInt1isBit=false&useLegacyDatetimeCode=false&serverTimezone=UTC"


def mysql_url(host: str, port: int, db: str) -> str:
    return f"jdbc:mysql://{host}:{port}/{db}?{MYSQL_URL_OPTIONS}"


def snapshot_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """Partitioned JDBC snapshot of one table (R1, query.clj:45-64).

    With partition_column (the PK), Spark issues num_partitions parallel range
    SELECTs; filters later applied to the DataFrame are pushed down into the
    remote SQL by the JDBC source.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("fetchsize", "10000")
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned scan needs lower_bound/upper_bound (min/max of PK)")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def fetch_information_schema(
    spark: SparkSession, url: str, db: str, user: str, password: str
) -> DataFrame:
    """Schema catalog read (R9): information_schema.COLUMNS ordered by
    ORDINAL_POSITION (query.clj:66-73). Re-read per micro-batch (cheap,
    broadcast-sized) => picks up DDL, replacing the reference's wholesale
    cache invalidation on ALTER TABLE (stream.clj:204-212)."""
    q = (
        "(SELECT TABLE_NAME, COLUMN_NAME, ORDINAL_POSITION, DATA_TYPE, "
        "CHARACTER_SET_NAME, COLUMN_KEY "
        f"FROM information_schema.COLUMNS WHERE TABLE_SCHEMA = '{db}' "
        "ORDER BY TABLE_NAME, ORDINAL_POSITION) AS cols"
    )
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", q)
        .option("user", user)
        .option("password", password)
        .load()
    )


def binlog_position(spark: SparkSession, url: str, user: str, password: str) -> dict:
    """SHOW MASTER STATUS equivalent (R13, query.clj:19-25) via JDBC."""
    df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "(SHOW MASTER STATUS) AS s")
        .option("user", user)
        .option("password", password)
        .load()
    )
    row = df.first()
    return {"file": row["File"], "position": int(row["Position"])}
