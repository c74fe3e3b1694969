"""Resume-position bookkeeping (reference R5/R13/R14).

In the reference, each binlog row's meta carries {:next-position :next-file}
(/root/reference/src/dumpr/events.clj:52-54, stream.clj:56-74) and the library
exposes `next-position` / `binlog-position` / `valid-binlog-pos?`
(core.clj:105-131, query.clj:19-30). In Spark, durable resume lives in the
streaming checkpoint; these helpers reproduce the *queryable* semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stamp_binlog_filename(events: DataFrame, init_file: str, seq_col: str = "seq") -> DataFrame:
    """Carry the current binlog file through the stream (R5, stream.clj:56-74).

    Rotate events carry the new filename in ``rotate_file``; every event gets
    ``next_file`` = the latest non-null rotate filename at-or-before it (or the
    initial file), and rotate events themselves are consumed (stripped), exactly
    like the reference's stateful transducer.

    Scale shape (r4: replaced the single-partition ``last_value OVER (ORDER BY
    seq)`` window): rotate events are SPARSE — one per binlog file — so the
    carry-forward is an as-of assignment against a tiny boundary table. The
    sorted (seq, file) rotate list is one broadcast array; each event picks
    the last boundary at-or-before its seq with a JVM higher-order filter.
    No shuffle, no global sort, no single-task window — the event side stays
    on its scan partitioning. Cost per row is linear in |binlog files|
    (thousands at most; a 1 GiB-capped binlog needs ~100k files per 100 TB
    of churn, still a few-MB broadcast)."""
    rot = events.where(F.col("rotate_file").isNotNull()).select(
        F.col(seq_col).alias("_rs"), F.col("rotate_file").alias("_rf")
    )
    rot_arr = rot.agg(
        F.array_sort(F.collect_list(F.struct("_rs", "_rf"))).alias("_rots")
    )
    applicable = F.filter(F.col("_rots"), lambda r: r["_rs"] <= F.col(seq_col))
    return (
        events.where(F.col("rotate_file").isNull())
        .crossJoin(F.broadcast(rot_arr))
        .withColumn(
            "next_file",
            # try_element_at: events BEFORE the first rotate see an empty
            # applicable list and fall back to the initial file
            F.coalesce(F.try_element_at(applicable, F.lit(-1))["_rf"], F.lit(init_file)),
        )
        .drop("_rots", "rotate_file")
    )


def next_position(changes: DataFrame) -> dict | None:
    """Latest processed resume coordinate = max-by-seq of (file, position)
    (R13; reference records it in an atom at stream.clj:296-298,319-320).

    An aggregation with map-side partial combine — one tiny row to the driver
    regardless of input size.
    """
    row = (
        changes.where(F.col("next_position").isNotNull())
        .agg(
            F.max_by(F.struct("next_file", "next_position"), F.col("seq")).alias("p"),
        )
        .select(F.col("p.next_file").alias("file"), F.col("p.next_position").alias("position"))
        .first()
    )
    if row is None or row["file"] is None:
        return None
    return {"file": row["file"], "position": int(row["position"])}


def valid_binlog_pos(pos: dict, binary_logs: list[dict]) -> bool:
    """Position valid iff its file exists and position <= file_size
    (R14, core.clj:113-131, query.clj:27-30). ``binary_logs`` is the parsed
    result of SHOW BINARY LOGS ({'log_name':..., 'file_size':...})."""
    return any(
        log["log_name"] == pos["file"] and pos["position"] <= log["file_size"]
        for log in binary_logs
    )
