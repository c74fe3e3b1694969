"""Document chunking and sequence packing for training-data pipelines.

Two pre-tokenization ops every LLM data pipeline runs between "deduped
corpus" and "training shards":

- **chunking**: split each document's token stream into fixed-size,
  optionally-overlapping windows (the context-length cut). Pure JVM array
  ops — `split` + `sequence` + `slice` + one `explode` — so at 100 TB it
  is a narrow, shuffle-free projection whose output is partitioned exactly
  like its input.
- **packing**: greedy first-fit-in-order bin packing of documents into
  fixed token-budget training sequences (minimize padding). Packing is
  inherently sequential *within* a stream, so the scale shape is
  stratified: partition by a stratum key (language, source shard, ...) and
  pack each stratum independently with one Arrow-batched
  `applyInPandas` pass. At 100 TB strata are sized by upstream sharding
  (e.g. (lang, hash(doc_id) % n_shards)) so no single group exceeds one
  task; the greedy loop itself is O(docs-in-stratum) numpy-light work.

No reference analog (the reference is a CDC library) — these belong to the
north-star LLM-pipeline surface (SURVEY §2.2-J mandate).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
    stride: int = 12,
) -> DataFrame:
    """Sliding-window token chunks: windows of `chunk_tokens` whitespace
    tokens starting every `stride` tokens. Documents shorter than one window
    emit a single (short) chunk. The final window may be partial; starts run
    to n - chunk_tokens + stride so the tail grid start is included, which
    guarantees every token is covered when stride <= chunk_tokens.

    Output: (id, start, chunk_text, n_tokens), `start` 1-based in tokens.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.least(n - chunk_tokens + stride, n), F.lit(1)),
        F.lit(stride),
    )
    return (
        df.select(F.col(id_col), toks.alias("_tk"), starts.alias("_starts"))
        .select(F.col(id_col), "_tk", F.explode("_starts").alias("start"))
        .select(
            F.col(id_col),
            F.col("start"),
            F.array_join(F.slice("_tk", F.col("start"), chunk_tokens), " ").alias("chunk_text"),
            F.size(F.slice("_tk", F.col("start"), chunk_tokens)).cast("long").alias("n_tokens"),
        )
    )


def _greedy_pack(
    pdf: pd.DataFrame, budget: int, order_col: str, tokens_col: str
) -> pd.DataFrame:
    """Greedy first-fit-in-order packing of one stratum (driver of the
    applyInPandas pass below). A document larger than the whole budget gets a
    bin of its own (it is the caller's job to chunk oversized docs first)."""
    pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
    bins, fill, cur = [], 0, -1
    for n in pdf[tokens_col]:
        if cur < 0 or fill + n > budget:
            cur += 1
            fill = int(n)
        else:
            fill += int(n)
        bins.append(cur)
    pdf["bin"] = pd.Series(bins, dtype="int64")
    return pdf


def pack_sequences(
    df: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tok",
    budget: int = 256,
) -> DataFrame:
    """Assign each row a `bin` (training-sequence id, per stratum): greedy
    first-fit in `id_col` order, starting a new bin whenever adding the next
    document would exceed `budget` tokens.

    Deterministic (order-defined), so it is oracle-checkable: the DuckDB
    equivalent is a recursive CTE walking rows in the same order
    (queries/training.py). Grouped Arrow pass, not a driver loop — each
    stratum packs in one task.
    """
    out_schema = (
        f"{stratum_col} string, {id_col} long, {tokens_col} long, bin long"
    )
    slim = df.select(
        F.col(stratum_col).cast("string"),
        F.col(id_col).cast("long"),
        F.col(tokens_col).cast("long"),
    )
    return slim.groupBy(stratum_col).applyInPandas(
        lambda pdf: _greedy_pack(pdf, budget, id_col, tokens_col)[
            [stratum_col, id_col, tokens_col, "bin"]
        ],
        out_schema,
    )
