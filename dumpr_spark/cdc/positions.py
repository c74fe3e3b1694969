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
    seq)`` window; r6: an unrolled binary search against the rotate list
    folded into plan literals; r17: the DISTRIBUTED PREFIX SCAN below —
    the r16 round's filter_committed_txs shape, join-free). The r6 form's
    ceil(log2 n) let-bound probes per event were interpreted-expression
    work whose per-probe constant GREW with the boundary-array size: at
    the sf1-local exercise (1.5M events x 115k rotates) it measured
    45.6 s warm against a rows-x-log(n) prediction of ~20 s. This form:

    - bucket bounds are ~parallelism-many ROTATE seqs chosen on the
      driver from the already-collected rotate list (no extra pass over
      the feed; a binlog rotates per-bytes, so event mass between
      rotates is roughly constant and rotate-drawn bounds balance the
      buckets for exactly this feed shape);
    - every row (data AND rotate markers) gets its bucket from one short
      fold over the <=parallelism-element bounds literal;
    - a per-bucket PARTITIONED window (last rotate_file ignorenulls,
      rotate-before-data on seq ties, filename tiebreak) resolves
      in-bucket stamps in whole-stage codegen;
    - rows before their bucket's first in-bucket rotate read the CARRY —
      the last rotate of any earlier bucket — from a <=33-element plan
      literal indexed by bucket id (monotonicity of the bucket fold
      guarantees every earlier-bucket rotate seq <= every seq in this
      bucket, so the carry is exactly bisect_right semantics).

    No join (the plan pin in test_plan_lint stays strict), no global
    sort; ONE exchange on the bucket id replaces per-row interpreted
    probe chains with a codegen'd running last — per-row cost is now
    O(|bounds|) with |bounds| <= parallelism, INDEPENDENT of the rotate
    count. Rejected shapes (measured, sf0.1, 150k x 11.5k): per-row
    filter+take-last 254.6 s, 1-row crossJoin 45 s, two-level sqrt(n)
    chunked folds ~6 s, r6 binary search ~4 s at 11.5k rotates but
    super-linear in the rotate count (above)."""
    import bisect

    rot_rows = sorted(
        (r["_rs"], r["_rf"])
        for r in events.where(F.col("rotate_file").isNotNull())
        .select(F.col(seq_col).alias("_rs"), F.col("rotate_file").alias("_rf"))
        .collect()
    )
    if not rot_rows:
        return (
            events.where(F.col("rotate_file").isNull())
            .drop("rotate_file")
            .withColumn("next_file", F.lit(init_file))
        )
    spark = events.sparkSession
    seq = F.col(seq_col)
    n = len(rot_rows)
    seqs = [rs for rs, _ in rot_rows]
    files = [rf for _, rf in rot_rows]

    # <= parallelism interior bounds, drawn from the rotate seqs.
    # Skew assumption (r17 verdict note): rotate-drawn bounds presume event
    # mass is roughly balanced BETWEEN rotates — true for byte-triggered
    # binlog rotation, which is why this is acceptable. A pathological log
    # (one giant transaction between two rotates) skews ONE bucket, whose
    # codegen'd window then degrades to single-partition for that bucket
    # only; if that regime ever matters, split buckets by a max-events
    # bound drawn from a count-per-bucket pre-pass before the window.
    n_part = max(2, spark.sparkContext.defaultParallelism)
    step = max(1, -(-n // n_part))  # ceil
    bounds = seqs[step::step]
    if bounds:
        bucket = F.aggregate(
            F.lit(bounds), F.lit(0), lambda a, b: a + F.when(seq >= b, 1).otherwise(0)
        )
    else:
        bucket = F.lit(0)

    # carry[b] = file of the last rotate that landed in a bucket < b
    # (None -> init_file: "no rotate anywhere before this bucket")
    rot_buckets = [bisect.bisect_right(bounds, s) for s in seqs]
    carry = []
    for b in range(len(bounds) + 1):
        idx = bisect.bisect_left(rot_buckets, b) - 1
        carry.append(files[idx] if idx >= 0 else init_file)
    carry_lit = F.lit(carry)

    ev = events.withColumn("_b", bucket)
    # rotate rows sort BEFORE data rows on a seq tie (a data event AT a
    # rotate's seq takes that rotate — bisect_right semantics), and equal-
    # seq rotates tie-break on filename so "last" is the max file, matching
    # the sorted rotate list's element order
    w = (
        Window.partitionBy("_b")
        .orderBy(seq, F.col("rotate_file").isNull(), F.col("rotate_file"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_last = F.last(F.col("rotate_file"), ignorenulls=True).over(w)
    return (
        ev.withColumn("_local", local_last)
        .where(F.col("rotate_file").isNull())
        .withColumn(
            "next_file",
            F.coalesce(
                F.col("_local"),
                F.element_at(carry_lit, (F.col("_b") + 1).cast("int")),
            ),
        )
        .drop("rotate_file", "_b", "_local")
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
