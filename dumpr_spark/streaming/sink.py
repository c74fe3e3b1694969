"""Streaming sinks: the foreachBatch merge (upsert) sink and helpers.

The merge sink is the streaming materializer: each micro-batch of envelope
rows is folded into a keyed current-state parquet table (last-write-wins by
seq). Parquet has no MERGE, so the fold is read-modify-overwrite; on an
ACID table format the same `merge_batch` logic becomes a real MERGE INTO and
the rewrite cost drops to touched files. Idempotence (max-by-seq) makes batch
replay after checkpoint restart a no-op => exactly-once end to end.

At 100 TB the state table is partitioned by `tbl` (and bucketed by id on a
real deployment) so a micro-batch only rewrites partitions it touches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from dumpr_spark.cdc.envelope import ENVELOPE_SCHEMA
from dumpr_spark.cdc.materialize import materialize


class MergeSink:
    """foreachBatch target maintaining a current-state table at `state_path`.

    With `errors_path`, envelope preconditions are enforced per batch
    (validate_envelope) and op='error' rows are appended to a dead-letter
    parquet table instead of silently vanishing — the reference's in-band
    error channel (R20, row_format.clj:15, stream.clj:179-191) made durable.
    """

    def __init__(self, spark: SparkSession, state_path: str, errors_path: str | None = None):
        self.spark = spark
        self.state_path = state_path
        self.errors_path = errors_path

    def _recover(self) -> None:
        """Crash between the two swap renames leaves state absent + .bak
        holding the only copy — restore it before anything reads or swaps."""
        bak = self.state_path + ".bak"
        if not os.path.exists(self.state_path) and os.path.exists(bak):
            os.rename(bak, self.state_path)

    def read_state(self) -> DataFrame:
        self._recover()
        if not os.path.exists(self.state_path):
            return self.spark.createDataFrame([], ENVELOPE_SCHEMA)
        # explicit schema: an all-deleted state dir has no data files to infer
        # from, and partition-column inference must not re-type a numeric-
        # looking `tbl` value (schema pins it to STRING)
        return self.spark.read.schema(ENVELOPE_SCHEMA).parquet(self.state_path)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        import shutil

        if self.errors_path is not None:
            from dumpr_spark.cdc.envelope import validate_envelope
            from dumpr_spark.cdc.materialize import split_errors

            batch, errors = split_errors(validate_envelope(batch))
            # one partition dir per batch_id, overwritten on replay => the
            # dead-letter write is idempotent; empty batches skip the job
            if not errors.isEmpty():
                errors.write.mode("overwrite").parquet(
                    f"{self.errors_path}/batch_id={batch_id}"
                )
        current = self.read_state()  # runs _recover() first
        # fold: union + per-key max_by(seq), deletes drop out
        next_state = materialize(current.unionByName(batch))
        tmp = self.state_path + f".tmp-{batch_id}"
        next_state.write.mode("overwrite").partitionBy("tbl").parquet(tmp)
        # atomic-enough swap for local FS; object stores use rename-free commit.
        # After _recover(), a .bak that coexists with state is stale — drop it.
        bak = self.state_path + ".bak"
        shutil.rmtree(bak, ignore_errors=True)
        if os.path.exists(self.state_path):
            os.rename(self.state_path, bak)
        os.rename(tmp, self.state_path)
        shutil.rmtree(bak, ignore_errors=True)


def start_merge_stream(
    changes: DataFrame,
    state_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
    errors_path: str | None = None,
):
    """Start the materializing stream (R18/R19: sink + lifecycle)."""
    sink = MergeSink(changes.sparkSession, state_path, errors_path=errors_path)
    writer = (
        changes.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
