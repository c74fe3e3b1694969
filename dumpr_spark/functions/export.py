"""Training-data export: token-budget shard assignment and sharded writes.

The planning half (`assign_shards`) is the library form of the
`export_shard_manifest` registry query; the writing half
(`write_training_shards`) materializes the plan as one directory per
(stratum, shard) of JSONL — the layout a trainer's data loader consumes —
and returns the manifest. Assignment is deterministic and stable under
growth of OTHER strata (hash-of-id order), so re-exporting after adding a
language does not reshuffle existing shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_shards(
    df: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 500,
) -> DataFrame:
    """Add a `shard_id` column: per stratum, order rows by md5(id) (content-
    independent, growth-stable), running-total `token_col`, and cut at the
    cumulative budget boundary — shard = floor(tokens_before / budget), the
    greedy streaming-writer rule. Guarantees tokens(shard) <= budget +
    max-row-tokens; shard ids are monotone in the hash order but NOT
    guaranteed contiguous — a single row larger than the budget consumes
    several budget units and skips the intermediate ids, so consumers must
    iterate the manifest's actual ids, never range(0, max).

    Scale: one keyed window per stratum; a single giant stratum takes the
    two-phase distributed prefix scan (operators/ntile machinery) instead."""
    h = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(h.alias("h"), id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tok_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "shard_id", F.floor(tok_before / F.lit(float(budget))).cast("long")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 500,
) -> DataFrame:
    """Materialize the shard plan: one `<stratum>/<shard>` partition
    directory of JSONL per shard under `path` (Hive layout —
    `lang=en/shard_id=3/...`), rows repartitioned by (stratum, shard) so
    each shard lands as one task's output. Returns the manifest
    (stratum, shard_id, n_docs, tokens_total) read back from what was
    actually written — the manifest describes the artifact, not the plan."""
    assigned = assign_shards(df, stratum_col, id_col, token_col, budget)
    (
        assigned.repartition(F.col(stratum_col), F.col("shard_id"))
        .write.partitionBy(stratum_col, "shard_id")
        .mode("overwrite")
        .json(path)
    )
    spark = df.sparkSession
    # pin the read schema: unpinned partition-value inference re-types a
    # numeric-looking stratum (lang=007 -> lang=7) — the same hazard the
    # sink compactor pins against (SCALE.md) — and skips an inference scan
    back = spark.read.schema(assigned.schema).json(path)
    return (
        back.groupBy(stratum_col, "shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(token_col).cast("long").alias("tokens_total"),
        )
        .orderBy(stratum_col, "shard_id")
    )
