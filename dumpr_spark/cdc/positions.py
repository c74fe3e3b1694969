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
    seq)`` window; r6: replaced the broadcast-join linear scan): rotate
    events are SPARSE — one per binlog file — so the boundary list is
    METADATA-sized (a 1 GiB-capped binlog is ~100k files per 100 TB of
    churn). It is collected once and inlined as two constant-folded plan
    literals (one string literal each, split+cast — see
    operators/bloom.py for why NOT F.lit(list) or a broadcast join);
    each event then resolves its boundary with an UNROLLED branchless
    binary search — ceil(log2 n) let-bound probes of the shared sorted
    constant (~14 at 11.5k rotates, 17 at 100k), zero per-row
    allocation. No join, no shuffle, no global sort: the event side
    stays a pure narrow map on its scan partitioning.

    Three rejected shapes, all measured at sf0.1 (150k events x 11.5k
    rotates): per-row ``F.filter``+take-last over one broadcast array
    (O(n) comparisons AND an O(n) materialization per event, 254.6 s);
    the same lookup through a 1-row crossJoin (each joined row
    physically copies the full array before the projection reads it —
    ~350 KB/row, 45 s); two-level sqrt(n) chunked counting folds
    (~2*sqrt(n) interpreted fold steps + a chunk slice per row, ~6 s).
    The binary-search form takes ~4 s warm (each let costs an
    interpreted transform wrapper, so the per-probe constant is higher
    than a raw comparison — still the winning shape, and the gap to the
    fold form widens with n)."""
    from dumpr_spark.functions.expr import let

    rot_rows = sorted(
        (r["_rs"], r["_rf"])
        for r in events.where(F.col("rotate_file").isNotNull())
        .select(F.col(seq_col).alias("_rs"), F.col("rotate_file").alias("_rf"))
        .collect()
    )
    data = events.where(F.col("rotate_file").isNull()).drop("rotate_file")
    # r17: the unrolled binary search below is the heaviest narrow map in
    # the CDC family (ceil(log2 n) interpreted let-probes per event) and
    # otherwise runs single-task on a compact file-backed scan; range on
    # seq also hands a caller's trailing ORDER BY seq its partitioning
    # (prefix rule). No-op on a cluster-wide scan.
    from dumpr_spark.operators.scale import fan_out

    data = fan_out(data, seq_col, by_range=True)
    if not rot_rows:
        return data.withColumn("next_file", F.lit(init_file))
    files = [rf for _, rf in rot_rows]
    if any(f is None or "\x1f" in f for f in files):
        raise ValueError(
            "stamp_binlog_filename: rotate filenames must be non-null and "
            "free of the 0x1f literal separator"
        )
    n = len(rot_rows)
    seqs = [rs for rs, _ in rot_rows]
    flat_rs = F.split(F.lit(",".join(str(x) for x in seqs)), ",").cast("array<long>")
    flat_rf = F.split(F.lit("\x1f".join(files)), "\x1f")
    seq = F.col(seq_col)

    # branchless binary search for "how many rotate seqs <= seq" — which,
    # on the sorted constant, IS the 1-based index of the last applicable
    # boundary (0 = none). Each step tests one probe position; k is
    # let-bound so the chain evaluates each partial count exactly once.
    # try_element_at past the end yields NULL -> NULL <= seq -> when
    # falls through to otherwise(k), so no bounds branch is needed.
    def search_step(prev, p):
        # NOTE: the body must be a ONE-parameter callable — pyspark treats
        # a two-parameter lambda passed to transform as (element, index),
        # silently rebinding the second name to the array index
        return let(
            prev,
            lambda k: F.when(
                F.try_element_at(flat_rs, (k + F.lit(p)).cast("int")) <= seq,
                k + F.lit(p),
            ).otherwise(k),
        )

    k_expr = F.lit(0)
    for p in (1 << i for i in range(n.bit_length() - 1, -1, -1)):
        k_expr = search_step(k_expr, p)
    # events BEFORE the first rotate count 0 -> fall back to the initial
    # file. The positivity test is EXPLICIT (not a coalesce on a NULL
    # index): element_at with a NULL ordinal resolves as -1 (the LAST
    # element) rather than NULL — observed on Spark 4.1,
    # regression-pinned in test_cdc_core.
    hit = let(
        k_expr,
        lambda k: F.when(k > 0, F.element_at(flat_rf, k.cast("int"))),
    )
    return data.withColumn("next_file", F.coalesce(hit, F.lit(init_file)))


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
