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

    The reference keeps a BOOLEAN ``ongoing?`` flag: :tx-begin sets it (a
    nested begin neither resets the buffer nor deepens anything), :tx-commit
    releases the buffered rows and clears the flag, :tx-rollback discards
    them, and rows arriving OUTSIDE a transaction pass straight through
    (``(rf result input)`` — non-transactional binlog events like DDL must
    survive). Batch re-expression of that state machine:

    - a data row is in-tx iff the LAST marker before it is a begin;
    - tx groups are delimited by terminators (commit/rollback): group id =
      count of terminators strictly before the row, so each group contains
      at most one terminator — the one that ends it;
    - an in-tx row survives iff its group's terminator is a commit (a
      trailing open tx has no terminator in-group and is dropped, matching
      the streaming fold which keeps it buffered);
    - out-of-tx rows always survive; markers are stripped.

    The streaming twin (`streaming.state._fold_tx_rows`) must agree on every
    event sequence — pinned by a hypothesis property test. A single
    total-order window is inherently serial; this filter exists for
    completeness/parity — at scale the CDC feed is commit-filtered at the
    source (Debezium-shaped), making this a no-op (SURVEY §4.2.3), or the
    stream is windowed per source-connection (partitionBy that key).
    """
    w_prev = Window.orderBy(seq_col).rowsBetween(Window.unboundedPreceding, -1)
    is_end = F.when(F.col(type_col).isin(TX_COMMIT, TX_ROLLBACK), 1).otherwise(0)
    last_marker = F.last(
        F.when(F.col(type_col).isin(*_TX_MARKERS), F.col(type_col)), ignorenulls=True
    ).over(w_prev)
    ends_before = F.coalesce(F.sum(is_end).over(w_prev), F.lit(0))
    with_tx = (
        # coalesce: rows before any marker are out-of-tx (NULL last_marker)
        events.withColumn("_in_tx", F.coalesce(last_marker == TX_BEGIN, F.lit(False)))
        .withColumn("_tx_id", ends_before)
    )
    w_tx = Window.partitionBy("_tx_id")
    committed = with_tx.withColumn(
        "_committed",
        F.max(F.when(F.col(type_col) == TX_COMMIT, 1).otherwise(0)).over(w_tx),
    )
    return (
        committed.where(
            ~F.col(type_col).isin(*_TX_MARKERS)
            & (~F.col("_in_tx") | (F.col("_committed") == 1))
        )
        .drop("_tx_id", "_committed", "_in_tx")
    )
