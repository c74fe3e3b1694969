"""Declared query inventory — the t2 correctness contract (SURVEY §2.2).

Every operator the engine claims is registered here as a (Spark builder,
DuckDB oracle SQL) pair; the driver runs both at sf0.01 and compares
row-count + schema + order-insensitive value hash. Registration happens on
import of the submodules below.
"""

from dumpr_spark.queries.base import REGISTRY, oracle_sql, queries

# Importing registers queries. Order matters: the driver walks the registry
# in insertion order and may stop at a budget, so families it has NOT yet
# verified in a previous round go first (round 1 covered the first 50 —
# relational/windows/most scalars — leaving cdc/llm/streaming/udf unchecked).
from dumpr_spark.queries import cdc  # noqa: E402,F401
from dumpr_spark.queries import llm  # noqa: E402,F401
from dumpr_spark.queries import multimodal  # noqa: E402,F401
from dumpr_spark.queries import streaming_batch  # noqa: E402,F401
from dumpr_spark.queries import udfs  # noqa: E402,F401
from dumpr_spark.queries import scalars  # noqa: E402,F401
from dumpr_spark.queries import windows  # noqa: E402,F401
from dumpr_spark.queries import relational  # noqa: E402,F401

__all__ = ["REGISTRY", "queries", "oracle_sql"]
