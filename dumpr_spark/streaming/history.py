"""Streaming SCD Type-2 history sink: the temporal twin of MergeSink.

Where MergeSink folds the change stream to CURRENT state (the entity-map
fold, test_util.clj:110-123), HistorySink preserves every version with a
validity interval: each upsert becomes a row valid over [valid_from =
its seq, valid_to = the key's next change's seq); an open interval
(valid_to IS NULL) marks the current version, and a key whose latest change
is a delete has no open row. This is the point-in-time view the reference's
"live views of data for caching or analytics" use case (README.md:14-21)
needs when the consumer asks "what did this row look like at position P?" —
the batch-query twin is `cdc_scd2_history` / `cdc_time_travel`
(queries/cdc.py).

Storage/fold discipline is inherited from MergeSink verbatim (touched-
partition rewrite, hardlink carry-forward of untouched ``tbl=`` partitions,
atomic swap, crash recovery): history rows are the key's change log with the
lead(seq) interval precomputed, so re-deriving a touched partition is
`dropDuplicates(tbl,id,seq)` over (persisted versions ∪ batch) + one keyed
lead() window — O(touched state) per batch, and deterministic, which makes
checkpoint-replay idempotent (a replayed batch re-derives byte-identical
intervals). Delete events persist as terminator rows (op='delete'): they
close the prior version's interval and mark the deletion seq; they are *data*
here, not tombstones — their seq is visible as the closing ``valid_to`` of
the prior version (`read_history` returns upsert versions only; the
terminator rows themselves live in `_read_raw`), and `read_state` excludes
deleted keys. Error rows (op='error', the in-band channel R20) NEVER enter
the interval window — routed to the dead-letter sink when `errors_path` is
set, dropped otherwise (same contract as MergeSink, whose materialize()
filters OP_ERROR). On an ACID table format the same fold becomes MERGE over
the touched keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from dumpr_spark.cdc.envelope import (
    ENVELOPE_COLS, ENVELOPE_SCHEMA, OP_ERROR, OP_UPSERT,
)
from dumpr_spark.streaming.sink import (
    AUTO_TARGET_ROWS_PER_BUCKET, GROWTH_WARN_FACTOR, MergeSink,
)

HISTORY_SCHEMA = StructType(
    list(ENVELOPE_SCHEMA.fields) + [StructField("valid_to", LongType(), nullable=True)]
)


class HistorySink(MergeSink):
    """foreachBatch target maintaining an SCD2 history table at `state_path`.

    Persisted rows = the envelope columns plus ``valid_to`` (seq of the key's
    next change; NULL = still current). ``seq`` doubles as ``valid_from``.
    """

    _schema = HISTORY_SCHEMA

    def read_history(self) -> DataFrame:
        """All versions with intervals: one row per upsert version carrying
        [valid_from, valid_to) and is_current; delete terminators excluded
        (their seq is visible as the closing valid_to of the prior row)."""
        out = (
            self._read_raw()
            .where(F.col("op") == OP_UPSERT)
            .withColumn("valid_from", F.col("seq"))
            .withColumn("is_current", F.col("valid_to").isNull())
        )
        return out.drop("_kb") if self.key_bucket else out

    def read_state(self) -> DataFrame:
        """The live current-state view — open upsert intervals only. Matches
        MergeSink.read_state()/materialize() on the same change stream."""
        out = (
            self._read_raw()
            .where((F.col("op") == OP_UPSERT) & F.col("valid_to").isNull())
            .drop("valid_to")
        )
        return out.drop("_kb") if self.key_bucket else out

    def compact(self) -> None:  # pragma: no cover - guard, exercised in tests
        raise NotImplementedError(
            "HistorySink keeps deletes as interval terminators (data, not "
            "tombstones); there is nothing to compact away. Retention policy "
            "(dropping intervals closed before a horizon) is a deliberate, "
            "caller-owned truncation — see prune_closed_before()."
        )

    def prune_closed_before(self, horizon_seq: int) -> None:
        """Retention: drop upsert versions whose interval closed before
        `horizon_seq`, and delete-terminator rows with seq < horizon (open
        or closed — safe under the same feed guarantee as MergeSink.compact:
        no event with a lower seq can still arrive, so the terminator's
        resurrection-blocking job is over). Point-in-time queries earlier
        than the horizon become unanswerable — an explicit, caller-owned
        trade. Only partitions that actually contain prunable rows are
        rewritten; the rest carry forward by hardlink (same touched-set
        discipline as MergeSink.compact)."""
        from dumpr_spark.streaming.sink import _pair_filter

        raw = self._read_raw()
        prunable = (
            (F.col("valid_to").isNotNull() & (F.col("valid_to") < F.lit(horizon_seq)))
            | ((F.col("op") != OP_UPSERT) & (F.col("seq") < F.lit(horizon_seq)))
        )
        if self.key_bucket is not None:
            pairs = [
                (r["tbl"], r["_kb"])
                for r in raw.where(prunable).select("tbl", "_kb").distinct().collect()
            ]
            if pairs:
                keep = raw.where(_pair_filter(pairs)).where(~prunable)
                self._commit(keep, pairs, f"prune-{horizon_seq}")
            return
        touched = [
            r["tbl"] for r in raw.where(prunable).select("tbl").distinct().collect()
        ]
        if touched:
            keep = raw.where(F.col("tbl").isin(touched)).where(~prunable)
            self._commit(keep, touched, f"prune-{horizon_seq}")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if self.errors_path is not None:
            from dumpr_spark.cdc.envelope import validate_envelope
            from dumpr_spark.cdc.materialize import split_errors

            batch, errors = split_errors(validate_envelope(batch))
            if not errors.isEmpty():
                errors.write.mode("overwrite").parquet(
                    f"{self.errors_path}/batch_id={batch_id}"
                )
        # error rows must never enter the interval window: a persisted error
        # row would close the key's live upsert interval at the error's seq
        # (MergeSink gets this for free because materialize() filters
        # OP_ERROR; the lead() fold has no such built-in filter)
        batch = batch.where(F.col("op") != OP_ERROR)
        self._resolve_auto(batch)
        if self.key_bucket == "auto":
            return  # empty seed batch, no state yet: nothing to derive from
        env_cols = ENVELOPE_COLS
        w = Window.partitionBy("tbl", "id").orderBy("seq")
        if self.key_bucket is not None:
            # bucketed layout: a key's WHOLE history shares one bucket
            # (the bucket is a deterministic function of id), so the
            # per-(tbl, id) interval window never spans buckets and the
            # touched unit is the (tbl, bucket) pair — same discipline
            # as MergeSink's bucketed fold
            from dumpr_spark.streaming.sink import _pair_filter

            kb_batch = batch.withColumn("_kb", self._kb())
            touched = [
                (r["tbl"], r["_kb"])
                for r in kb_batch.select("tbl", "_kb").distinct().collect()
            ]
            if not touched:
                return
            # touched-dirs scan — O(touched) listing, not O(all buckets);
            # _pair_filter stays for its NULL-bucket raise (see
            # MergeSink._read_touched)
            current = self._read_touched(touched)
            prior = current.where(_pair_filter(touched)).drop("valid_to", "_kb")
            merged = prior.unionByName(batch.select(*env_cols))
            merged = merged.dropDuplicates(["tbl", "id", "seq"])
            next_touched = (
                merged.withColumn("valid_to", F.lead("seq").over(w))
                .withColumn("_kb", self._kb())
            )
            self._commit(next_touched, touched, batch_id)
            self._maybe_compact_files(batch_id)
            return
        touched = [r["tbl"] for r in batch.select("tbl").distinct().collect()]
        if not touched:
            return
        # same pre-write NULL/empty-tbl refusal as MergeSink's plain path
        # (the bucketed path above gets it via _pair_filter)
        from dumpr_spark.streaming.sink import _check_tbls

        _check_tbls(touched)
        current = self._read_raw()
        # versions already persisted for the touched tables, stripped back to
        # raw change rows (valid_to is derived state, recomputed below)
        prior = current.where(F.col("tbl").isin(touched)).drop("valid_to")
        merged = prior.unionByName(batch.select(*env_cols))
        # (tbl,id,seq) is the change identity — replayed batches collapse here
        merged = merged.dropDuplicates(["tbl", "id", "seq"])
        next_touched = merged.withColumn("valid_to", F.lead("seq").over(w))
        self._commit(next_touched, touched, batch_id)
        self._maybe_compact_files(batch_id)


def start_history_stream(
    changes: DataFrame,
    history_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
    errors_path: str | None = None,
    output_mode: str = "update",
    key_bucket=None,
    compact_every_n_batches: int | None = None,
    growth_warn_rows_per_bucket: int | None =
    GROWTH_WARN_FACTOR * AUTO_TARGET_ROWS_PER_BUCKET,
):
    """Start the SCD2-materializing stream (R18/R19 lifecycle, temporal).
    output_mode: same contract as start_merge_stream — foreachBatch itself
    is mode-agnostic, but an upstream applyInPandasWithState declared in
    append mode (the streaming tx filter) requires output_mode="append".
    key_bucket: optional (tbl, bucket)-sliced layout — a policy object,
    or "auto" to derive one from the first non-empty batch via the
    certified sizing helpers; see MergeSink.
    compact_every_n_batches: optional small-files auto-cadence — see
    MergeSink._maybe_compact_files.
    growth_warn_rows_per_bucket: the seed-pinned layout's growth-signal
    threshold (None disables) — see MergeSink._check_bucket_growth (a
    history slice's footer count includes closed versions, which is the
    honest unit: the rewrite term pays every persisted row)."""
    sink = HistorySink(changes.sparkSession, history_path,
                       errors_path=errors_path, key_bucket=key_bucket,
                       compact_every_n_batches=compact_every_n_batches,
                       growth_warn_rows_per_bucket=growth_warn_rows_per_bucket)
    writer = (
        changes.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
