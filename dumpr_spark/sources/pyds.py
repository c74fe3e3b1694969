"""Spark 4 Python Data Source for the CDC event feed — the engine-native
source boundary (R2/R13/R14/R15/R17).

The reference's binlog source is a client that (a) starts from a stored
(file, position), (b) emits a totally-ordered event stream, and (c) hands
the consumer the next position to persist (binlog.clj:29-51; position
handling stream.clj:70-74). Spark's file source approximates that with
file-tracking checkpoints, but the OFFSET it tracks is "which files were
read", not "which binlog position was reached" — the reference's operational
contract ("resume exactly where the client stopped, validate the position
still exists", R13/R14) lives outside it.

This module closes that architectural gap with Spark 4's Python Data Source
API: ``dumpr_cdc`` is a real registered source whose STREAMING OFFSET IS
the binlog position (seq, with file/pos carried for operator visibility).
The checkpoint then stores exactly what the reference stores, and a resumed
query continues from seq > offset regardless of how the feed files were
rewritten, rotated, or compacted in between — file identity no longer
matters, position does.

The file-fed implementation stands in for the network client (the MySQL
wire protocol is out of reach here — same declared boundary as
streaming/ingest.py); a production deployment replaces `_scan` with
BinaryLogClient-style reads and keeps every Spark-facing contract
unchanged. The JVM file source path (streaming/ingest.py) remains the
hot path for bulk file feeds: this source trades JVM-side JSON decode for
position-true offsets, and parallelizes batch reads one task per file
(R17) rather than per JSON line.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from dumpr_spark.sources.cdc_json import EVENT_SCHEMA

_FIELDS = [f.name for f in EVENT_SCHEMA.fields]


def _parse_ts(v):
    if v is None:
        return None
    # feed timestamps are ISO-8601, 'Z' suffix allowed
    dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        # naive = session-TZ wall time (UTC here), same as the JVM JSON
        # reader; astimezone() would reinterpret it in the HOST's zone
        return dt
    return dt.astimezone(timezone.utc).replace(tzinfo=None)


def _event_tuple(obj: dict):
    return tuple(
        _parse_ts(obj.get(f)) if f == "ts" else obj.get(f) for f in _FIELDS
    )


def _feed_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".json") and not f.startswith((".", "_"))
    )


def _scan_file(fp: str, min_seq_exclusive: int = -1, max_seq_inclusive: int | None = None):
    """Per-file event scan — the ONE parse/filter loop both readers use, so
    a decode fix can never diverge between the batch and stream paths."""
    with open(fp) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            seq = obj.get("seq")
            if seq is None or seq <= min_seq_exclusive:
                continue
            if max_seq_inclusive is not None and seq > max_seq_inclusive:
                continue
            yield _event_tuple(obj)


def _scan(path: str, min_seq_exclusive: int = -1, max_seq_inclusive: int | None = None):
    """Yield event tuples with seq in (min_seq_exclusive, max_seq_inclusive].
    The production replacement wraps the binlog client's event iterator —
    everything above this function is client-agnostic."""
    for fp in _feed_files(path):
        yield from _scan_file(fp, min_seq_exclusive, max_seq_inclusive)


class _FeedPartition(InputPartition):
    def __init__(self, file_path: str, min_seq: int):
        self.file_path = file_path
        self.min_seq = min_seq


class CdcFeedBatchReader(DataSourceReader):
    """One input partition per feed file (parallel decode stage, R17);
    `start_seq` option resumes past a stored position (R13)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dumpr_cdc requires a path option")
        self.min_seq = int(options.get("start_seq", -1))

    def partitions(self):
        return [_FeedPartition(fp, self.min_seq) for fp in _feed_files(self.path)]

    def read(self, partition: _FeedPartition | None):
        # an empty feed dir yields partitions() == [] and Spark substitutes
        # a single None partition — that read must be an empty result, not
        # an AttributeError
        if partition is None:
            return
        yield from _scan_file(partition.file_path, partition.min_seq)


class CdcFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming offset == binlog position. The offset dict carries the
    monotone seq (the packed (file, pos, row) total order the envelope
    reifies) plus the human-readable file/pos for operators; progress and
    checkpoints therefore record exactly what the reference's position
    store records (R13), and `initialOffset` honors a configured start
    position the way the client honors a stored one (R14/R15)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dumpr_cdc requires a path option")
        self.start_seq = int(options.get("start_seq", -1))
        # backpressure analog of the JVM path's maxFilesPerTrigger (R16):
        # without a cap, the first batch after downtime materializes the
        # ENTIRE unread backlog on the driver. With it, each micro-batch
        # takes the next N events in seq order (bounded heap over the feed
        # scan — O(N) driver memory regardless of backlog size) and the
        # offset advances incrementally until the backlog drains. The cap
        # is for CONTINUOUS tailing (processingTime triggers): under
        # Trigger.AvailableNow, Spark snapshots the first capped end
        # offset as the run's target, so one availableNow run drains one
        # capped batch and terminates — repeat runs, or drop the cap, to
        # bulk-drain with availableNow.
        self.max_events_per_batch = int(options.get("max_events_per_batch", 0))
        # per-file (mtime, size, inode) -> max seq, so a capped drain skips
        # files whose every event is already committed WITHOUT re-parsing
        # them each trigger — otherwise draining a B-event backlog N at a
        # time costs O(B^2/N) JSON parses. Invalidated on rewrite (the
        # inode catches an atomic same-size replace within one mtime tick,
        # the compaction idiom mtime+size alone can miss), so compaction
        # keeps exact semantics.
        self._file_max_seq: dict[str, tuple[tuple[float, int, int], int]] = {}

    def initialOffset(self) -> dict:
        return {"seq": self.start_seq, "file": None, "pos": None}

    def _scan_unread(self, min_seq_exclusive: int):
        """_scan with the per-file max-seq skip: a file whose cached max seq
        is <= the committed position contributes nothing — skip the parse."""
        seq_key = _FIELDS.index("seq")
        for fp in _feed_files(self.path):
            try:
                st = os.stat(fp)
                stamp = (st.st_mtime, st.st_size, st.st_ino)
            except OSError:
                stamp = None
            if stamp is not None:
                cached = self._file_max_seq.get(fp)
                if cached and cached[0] == stamp and cached[1] <= min_seq_exclusive:
                    continue
            file_max = -1
            for row in _scan_file(fp, min_seq_exclusive):
                if row[seq_key] > file_max:
                    file_max = row[seq_key]
                yield row
            if stamp is not None:
                prev = self._file_max_seq.get(fp)
                # keep the larger known max for an unchanged file: a scan
                # with a high min_seq sees only a suffix of the seqs
                if prev and prev[0] == stamp:
                    file_max = max(file_max, prev[1])
                self._file_max_seq[fp] = (stamp, file_max)

    def read(self, start: dict):
        if self.max_events_per_batch > 0:
            import heapq

            seq_key = _FIELDS.index("seq")
            rows = heapq.nsmallest(
                self.max_events_per_batch,
                self._scan_unread(int(start["seq"])),
                key=lambda r: r[seq_key],
            )
        else:
            rows = list(_scan(self.path, min_seq_exclusive=int(start["seq"])))
        if not rows:
            return iter([]), start
        seq_i = _FIELDS.index("seq")
        file_i = _FIELDS.index("rotate_file")
        pos_i = _FIELDS.index("next_position")
        last = max(rows, key=lambda r: r[seq_i])
        # the current binlog file is set by the LATEST rotate event in the
        # batch, not by the max-seq row (which is usually a row event with
        # rotate_file=None — carrying only that would pair a pre-rotate
        # filename with a post-rotate position, a (file,pos) that never
        # existed)
        rotates = [r for r in rows if r[file_i] is not None]
        cur_file = (
            max(rotates, key=lambda r: r[seq_i])[file_i] if rotates else start.get("file")
        )
        end = {"seq": last[seq_i], "file": cur_file, "pos": last[pos_i]}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        """Failure replay: deterministic re-scan of the exact seq interval.
        If the feed was purged/compacted past a committed-but-unreplayed
        interval, the interval is GONE — mirror the reference's invalid-
        position error (R14) instead of silently committing an empty batch.
        (Partial loss inside a still-nonempty interval is undetectable
        without a manifest — the same exposure a purged binlog gives the
        reference's client; the operational answer is likewise the same:
        retention must outlast checkpoint lag.)"""
        lo, hi = int(start["seq"]), int(end["seq"])
        rows = list(_scan(self.path, min_seq_exclusive=lo, max_seq_inclusive=hi))
        if not rows and hi > lo:
            raise RuntimeError(
                f"dumpr_cdc: replay interval ({lo}, {hi}] is no longer present "
                "in the feed (purged/compacted past an uncommitted batch) — "
                "position invalid; restart from a fresh snapshot"
            )
        return iter(rows)


class CdcFeedDataSource(DataSource):
    """spark.dataSource.register(CdcFeedDataSource); then
    spark.read.format("dumpr_cdc").option("path", dir) or
    spark.readStream.format("dumpr_cdc")... — schema is the engine's
    EVENT_SCHEMA, rows feed events_to_changes unchanged."""

    @classmethod
    def name(cls) -> str:
        return "dumpr_cdc"

    def schema(self):
        return EVENT_SCHEMA

    def reader(self, schema):
        return CdcFeedBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return CdcFeedStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        # fail at sink construction, not as an opaque executor error
        names = {f.name: f.dataType.simpleString() for f in schema.fields}
        if names.get("value") != "string":
            raise ValueError(
                "dumpr_cdc sink expects a single string 'value' column "
                f"(the Debezium-wire JSON), got {names}"
            )
        return CdcWireStreamWriter(self.options)


# ---------------------------------------------------------------------------
# Egress sink: Debezium-wire JSONL stream writer (exactly-once by batch id)
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    WriterCommitMessage,
)


def _touch_heartbeat(run_tmp_dir: str) -> None:
    """Refresh the run's liveness marker (`_heartbeat` mtime). Called from
    every executor-side write() and every driver-side commit(); the stale-
    temp sweep in CdcWireStreamWriter.commit only reclaims run dirs whose
    heartbeat — not dir mtime — exceeds stale_temp_ttl_sec, so a live run
    with a slow in-flight batch is never swept mid-publish."""
    hb = os.path.join(run_tmp_dir, "_heartbeat")
    try:
        with open(hb, "a"):
            pass
        os.utime(hb, None)
    except OSError:
        pass  # best-effort: a missed touch only risks an early sweep


@dataclass
class _WireCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class CdcWireStreamWriter(DataSourceStreamWriter):
    """Streaming sink for the Debezium-wire feed (the egress complement of
    the dumpr_cdc reader): each task writes its partition of `value` strings
    to a task-temp file; `commit` folds them into ONE
    ``batch-<id>.jsonl`` per micro-batch with a write-aside rename.

    Exactly-once: the committed artifact is named by batchId, and commit
    SKIPS a batch whose file already exists — a checkpoint replay after a
    crash between sink commit and offset-log commit re-delivers the same
    batchId and becomes a no-op instead of duplicate wire records (the
    replay-idempotence discipline of the JDBC MERGE sink, from the batch id
    Spark guarantees stable across retries). `abort` removes task temps;
    `commit` additionally sweeps orphaned temps from crashed task attempts.
    Temps are namespaced per WRITER RUN (``_tmp/<run_id>/``, the run id
    minted driver-side at writer construction and carried to executors in
    the pickled writer): batches are sequential per stream, so by commit
    time every file in this run's subtree belongs to this batch or to a
    dead attempt — and a SECOND query (or an accidental concurrent re-run)
    writing to the same path sweeps only its own subtree instead of
    deleting the other's in-flight temps. A crashed run's leftover subtree
    is inert (never published) but would otherwise accumulate across
    crash/restart cycles, so commit ALSO removes other runs' dirs whose
    mtime is older than ``stale_temp_ttl_sec`` (default 86400): a live
    concurrent run refreshes its dir's mtime every batch it writes, so
    only dead runs age past the TTL.

    DEPLOYMENT BOUNDARY (same as MergeSink's local-FS rename semantics,
    SCALE.md): tasks and driver must share the filesystem (local mode, NFS,
    or a fuse-mounted store) — write() creates temps the driver-side
    commit() concatenates. On an object store, replace the temp+rename fold
    with the store's multipart-upload commit; every Spark-facing contract
    (batchId naming, replay no-op) stays as is.

    Null `value` rows (Debezium tombstones) are SKIPPED: a compaction
    marker carries no row data, and the file feed's reader drops unparseable
    lines anyway — counted in the commit message for observability."""

    def __init__(self, options):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("dumpr_cdc sink requires a path option")
        self.run_id = uuid.uuid4().hex
        self.stale_temp_ttl_sec = int(options.get("stale_temp_ttl_sec", 86400))

    def write(self, iterator) -> _WireCommit:
        import os
        import uuid

        from pyspark import TaskContext

        tc = TaskContext.get()
        tmp_dir = os.path.join(self.path, "_tmp", self.run_id)
        os.makedirs(tmp_dir, exist_ok=True)
        # liveness heartbeat: the stale-run sweep keys off THIS file's
        # mtime, not the dir's, so a run whose batch stays in flight (or
        # that idles) longer than the TTL is still recognized as live —
        # every task touch and every commit refreshes it.
        _touch_heartbeat(tmp_dir)
        tmp = os.path.join(
            tmp_dir, f"task-{tc.partitionId()}-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                v = row["value"]
                if v is None:  # tombstone: no wire payload to publish
                    continue
                f.write(v + "\n")
                n += 1
        return _WireCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        import os
        import shutil

        final = os.path.join(self.path, f"batch-{batchId:010d}.jsonl")
        aside = final + ".tmp"
        temps = [m.tmp_path for m in messages if m is not None]
        try:
            if os.path.exists(final):
                return  # replayed batch: already committed, exactly-once no-op
            with open(aside, "w") as out:
                for t in temps:
                    with open(t) as fh:
                        shutil.copyfileobj(fh, out)  # constant driver memory
            os.rename(aside, final)  # atomic publish
        finally:
            # a failure between aside-create and rename must not leave a
            # half-written .tmp for loose globs to pick up
            if os.path.exists(aside):
                try:
                    os.remove(aside)
                except OSError:
                    pass
            # sweep THIS RUN's temp subtree: this batch's temps plus orphans
            # from crashed/speculative task attempts that never reached
            # commit — other concurrent runs' subtrees are untouched...
            tmp_dir = os.path.join(self.path, "_tmp", self.run_id)
            if os.path.isdir(tmp_dir):
                for f in os.listdir(tmp_dir):
                    try:
                        os.remove(os.path.join(tmp_dir, f))
                    except OSError:
                        pass
                # re-arm THIS run's liveness marker after the cleanup wiped
                # it, so a concurrent run's sweep never mistakes us for dead
                _touch_heartbeat(tmp_dir)
            # ...UNLESS they are dead: a run whose HEARTBEAT (touched by
            # every task write and every commit — NOT the dir mtime, which
            # a long in-flight or idle batch leaves stale) is older than
            # the TTL belongs to a crashed/abandoned run; without this,
            # crash/restart cycles leak full batch payloads forever. Dirs
            # predating the heartbeat scheme fall back to dir mtime.
            import time

            root = os.path.join(self.path, "_tmp")
            cutoff = time.time() - self.stale_temp_ttl_sec
            if os.path.isdir(root):
                for d in os.listdir(root):
                    p = os.path.join(root, d)
                    try:
                        if d == self.run_id or not os.path.isdir(p):
                            continue
                        hb = os.path.join(p, "_heartbeat")
                        alive_at = os.path.getmtime(hb if os.path.exists(hb) else p)
                        if alive_at < cutoff:
                            import shutil as _sh

                            _sh.rmtree(p, ignore_errors=True)
                    except OSError:
                        pass

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.tmp_path)
                except OSError:
                    pass
