"""CDC layer: the canonical change-envelope DataFrame and its producers/consumers.

This is the Spark re-expression of the reference's single data abstraction —
an ordered stream of row-change tuples [op table id content meta]
(/root/reference/src/dumpr/row_format.clj:5-15).
"""

from dumpr_spark.cdc.envelope import (
    ENVELOPE_SCHEMA,
    OP_UPSERT,
    OP_DELETE,
    OP_ERROR,
    snapshot_to_changes,
    validate_envelope,
)
from dumpr_spark.cdc.materialize import materialize, into_entity_map
from dumpr_spark.cdc.filters import filter_database, filter_tables, filter_committed_txs

__all__ = [
    "ENVELOPE_SCHEMA",
    "OP_UPSERT",
    "OP_DELETE",
    "OP_ERROR",
    "snapshot_to_changes",
    "validate_envelope",
    "materialize",
    "into_entity_map",
    "filter_database",
    "filter_tables",
    "filter_committed_txs",
]
