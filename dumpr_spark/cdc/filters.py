"""Event-stream filters: database, table set, transaction atomicity.

Reference operators R4/R7/R8 (/root/reference/src/dumpr/stream.clj:22-54,
108-112, 114-125). These run on the *raw event* DataFrame (pre-envelope) —
the same early placement the reference hand-codes (filters upstream of the
expensive schema enrichment, stream.clj:275-280); in Spark, Catalyst's
predicate pushdown makes placement automatic.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window, functions as F

# Event-type markers for the transaction filter (reference classifies BEGIN /
# COMMIT / ROLLBACK query-events + xid at events.clj:81-92; xid => commit).
TX_BEGIN = "tx-begin"
TX_COMMIT = "tx-commit"
TX_ROLLBACK = "tx-rollback"
_TX_MARKERS = (TX_BEGIN, TX_COMMIT, TX_ROLLBACK)


def filter_database(events: DataFrame, db: str) -> DataFrame:
    """Keep only events of the configured db — exactly one db per stream
    (R7, stream.clj:108-112; one-db contract core.clj:45). Events with no db
    attribution (e.g. rotate) pass through, mirroring the reference's
    keep-if-nil behavior."""
    return events.where(F.col("db").isNull() | (F.col("db") == db))


def filter_tables(events: DataFrame, tables: Iterable[str] | None) -> DataFrame:
    """Keep only events of the given table set; table-less events pass;
    nil/empty set => allow-all (R8, stream.clj:114-125)."""
    tables = list(tables or [])
    if not tables:
        return events
    return events.where(F.col("tbl").isNull() | F.col("tbl").isin(tables))


def filter_committed_txs(events: DataFrame, seq_col: str = "seq", type_col: str = "event_type") -> DataFrame:
    """Batch transaction filter (R4, stream.clj:22-54).

    The reference buffers events from :tx-begin, releases the batch on
    :tx-commit, discards on :tx-rollback, and strips the boundary markers.
    Batch re-expression: number transactions by a running count of begins in
    stream order, keep transactions whose marker set contains a commit, drop
    the markers. Rows OUTSIDE any open transaction (between a commit/rollback
    and the next begin) are dropped — the same behavior as the streaming fold
    (`streaming.state._fold_tx_rows`), which only buffers while in_tx; the two
    forms must agree on every event sequence. A single total-order window is
    inherently serial; this filter exists for completeness/parity — at scale
    the CDC feed is commit-filtered at the source (Debezium-shaped), making
    this a no-op (SURVEY §4.2.3), or the stream is windowed per
    source-connection (partitionBy that key).
    """
    w_run = Window.orderBy(seq_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_prev = Window.orderBy(seq_col).rowsBetween(Window.unboundedPreceding, -1)
    is_end = F.when(F.col(type_col).isin(TX_COMMIT, TX_ROLLBACK), 1).otherwise(0)
    begins = F.sum(F.when(F.col(type_col) == TX_BEGIN, 1).otherwise(0)).over(w_run)
    ends = F.sum(is_end).over(w_run)
    ends_before = F.coalesce(F.sum(is_end).over(w_prev), F.lit(0))
    # a commit marker only CLOSES a tx if one is still open when it arrives
    # (begins so far > ends strictly before it) — an orphan commit after a
    # rollback shares the rolled-back tx's begin-count group and must not
    # resurrect it (found by the batch≡streaming property test)
    effective_commit = (F.col(type_col) == TX_COMMIT) & (begins > ends_before)
    with_tx = events.withColumn("_tx_id", begins).withColumn(
        # a data row is inside a tx iff more begins than commit/rollback ends
        # have passed — rows after an end and before the next begin are orphan
        "_in_tx", begins > ends
    ).withColumn("_eff_commit", effective_commit)
    w_tx = Window.partitionBy("_tx_id")
    committed = with_tx.withColumn(
        "_committed", F.max(F.when(F.col("_eff_commit"), 1).otherwise(0)).over(w_tx)
    )
    return (
        committed.where(
            (F.col("_committed") == 1) & F.col("_in_tx") & ~F.col(type_col).isin(*_TX_MARKERS)
        )
        .drop("_tx_id", "_committed", "_in_tx", "_eff_commit")
    )
