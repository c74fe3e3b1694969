"""dumpr_spark — a PySpark-native analytics engine with the capabilities of
sharetribe/dumpr (MySQL CDC: snapshot + ordered change stream + last-write-wins
materialization), extended with the relational / streaming / LLM-data-pipeline
operator surface those CDC use cases feed.

Reference semantics preserved (citations into /root/reference):
- row-format change tuple [op table id content meta]  (src/dumpr/row_format.clj:5-15)
- identical row shape across snapshot & binlog stream (README.md:149-151)
- last-write-wins entity-map fold                     (test/dumpr/test_util.clj:110-123)
- resume-position bookkeeping                         (src/dumpr/core.clj:105-131)
- strict stream order, reified as data                (src/dumpr/core.clj:85-89)

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst, columnar
Parquet + Tungsten execution, Structured Streaming for the live path. Nothing is
ported from the reference's channel/transducer pipeline.
"""

from dumpr_spark.session import get_spark
from dumpr_spark.engine import Engine

__all__ = ["get_spark", "Engine"]
__version__ = "0.1.0"
