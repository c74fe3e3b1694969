"""Streaming incremental time-series rollup (hypertable-style continuous
aggregate) built on the engine's own merge machinery.

Shape: watermark -> 1-minute windowed partial aggregate -> `update`-mode
foreachBatch. Each micro-batch emits the RECOMPUTED (count, sum) for every
window the batch touched; the partials become CDC upserts keyed
(event_type, minute) with seq = batch_id (state-store recomputation is
total per window, so latest-batch-wins is exactly right), and `MergeSink`
folds them into the persisted minute table — reusing its touched-partition
hardlink commit, tombstones, torn-swap recovery, and checkpoint-replay
idempotence instead of reimplementing a second sink.

Scale posture: the envelope's `tbl` is the window's DAY
(``rollup_yyyyMMdd``), so a micro-batch rewrites only the day partitions it
touched — steady-state streams touch 1-2 days regardless of history size.
Coarser grains (hour/day) are not separately maintained state: they re-
aggregate from the minute partials at read time (~60x/1440x smaller than
raw; the same partial re-aggregation the batch `rollup_timeseries` query
oracle-checks). Lateness beyond the watermark is dropped by the state store
BEFORE the sink, bounding per-window recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from dumpr_spark.streaming.sink import MergeSink

_CONTENT_SCHEMA = (
    "event_type STRING, w_start TIMESTAMP, n BIGINT, sv DOUBLE, "
    "bins ARRAY<BIGINT>, bw DOUBLE, hll STRING"
)


def rollup_minute_partials(
    stream: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    watermark: str = "10 minutes",
    with_bins: bool = False,
    bin_width: float = 5.0,
    n_bins: int = 100,
    distinct_col: str | None = None,
) -> DataFrame:
    """Streaming 1-minute windowed (count, sum) per event type.

    With ``with_bins``, each partial also carries a fixed-width histogram
    VECTOR (`n_bins` conditional sums folded in the SAME single streaming
    aggregation — no second stateful operator), making the persisted
    rollup quantile-readable: the vector is the mergeable sketch of
    functions/sketches.py in dense array form. With ``distinct_col``, it
    carries a base64 HLL sketch of that column, making the rollup
    distinct-count-readable at any grain via `hll_union_agg` — the same
    daily-sketch pattern agg_hll_mergeable declares, maintained
    incrementally. Both ride on the window-recompute-is-total property, so
    latest-batch-wins upserts stay exactly right for them."""
    from dumpr_spark.functions.sketches import bin_index

    aggs = [F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("sv")]
    if distinct_col is not None:
        aggs.append(F.base64(F.hll_sketch_agg(distinct_col)).alias("hll"))
    if with_bins:
        # shared bin expression (sketches.bin_index): NULL values produce a
        # NULL index, so `bin_of == i` is never true for them and they stay
        # out of every bin (they still count in n/sv)
        bin_of = bin_index(value_col, bin_width, n_bins)
        aggs.append(
            F.array(
                *[F.sum(F.when(bin_of == i, 1).otherwise(0)) for i in range(n_bins)]
            ).alias("bins")
        )
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 minute").alias("w"), F.col(type_col))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("w_start"),
            F.col(type_col).alias("event_type"),
            "n",
            "sv",
            *(["bins"] if with_bins else []),
            *(["hll"] if distinct_col is not None else []),
        )
    )
    if with_bins:
        # persist the binning geometry next to the vectors so a reader can
        # never interpolate with a different width than the writer used (a
        # plain literal projection — no reason to widen the streaming state)
        out = out.withColumn("bw", F.lit(float(bin_width)))
    return out


def start_rollup_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    **partial_kwargs,
) -> tuple[StreamingQuery, MergeSink]:
    """Wire a raw event stream into an incrementally-maintained minute rollup
    at `state_path`. Returns (query, sink); read with `read_rollup`."""
    partials = rollup_minute_partials(stream, **partial_kwargs)
    sink = MergeSink(spark, state_path)

    def _merge(batch: DataFrame, batch_id: int) -> None:
        env = batch.select(
            F.lit("upsert").alias("op"),
            F.concat(F.lit("rollup_"), F.date_format("w_start", "yyyyMMdd")).alias("tbl"),
            F.concat("event_type", F.lit("|"), F.date_format("w_start", "yyyy-MM-dd HH:mm")).alias("id"),
            F.to_json(
                F.struct("event_type", "w_start", "n", "sv",
                         *[c for c in ("bins", "bw", "hll") if c in batch.columns])
            ).alias("content"),
            F.col("w_start").alias("ts"),
            F.lit("rollup").alias("next_file"),
            F.lit(batch_id).cast("long").alias("next_position"),
            F.lit(batch_id).cast("long").alias("seq"),
        )
        sink(env, batch_id)

    query = (
        partials.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return query, sink


def _read_minute_rows(sink: MergeSink, grain: str) -> DataFrame:
    """Shared reader preamble: validate the grain and parse the persisted
    minute rows out of the envelope content (one place to change when the
    content schema evolves — from_json returns nulls, not errors, on
    mismatch, so a drifted copy would fail silently)."""
    if grain not in ("minute", "hour", "day"):
        raise ValueError(f"grain must be minute/hour/day, got {grain!r}")
    row = F.from_json("content", _CONTENT_SCHEMA)
    return sink.read_state().select(row.alias("r")).select("r.*")


def read_rollup(sink: MergeSink, grain: str = "minute") -> DataFrame:
    """Current rollup at minute/hour/day grain. Coarser grains re-aggregate
    the minute partials (sum of counts / sums) at read time."""
    m = _read_minute_rows(sink, grain)
    if grain == "minute":
        return m.select("event_type", F.col("w_start").alias("bucket"), "n", "sv")
    return (
        m.groupBy("event_type", F.date_trunc(grain, "w_start").alias("bucket"))
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )


def read_rollup_quantiles(
    sink: MergeSink,
    qs,
    grain: str = "hour",
    legacy_bin_width: float | None = None,
) -> DataFrame:
    """Quantile estimates at any grain from a bins-enabled rollup — the
    continuous-aggregate percentile read: explode the persisted minute
    histogram vectors to (group, bucket, bin, c), merge by summing (the
    lossless sketch-merge contract), and interpolate with
    functions/sketches.py. The bin width comes from the PERSISTED `bw`
    the writer recorded next to each vector — a reader can never
    interpolate with a different geometry than the stream was built with.
    Mixed widths in one state dir raise; empty state returns an empty
    result; state written before `bw` was persisted needs an explicit
    `legacy_bin_width` from the caller. The width probe collects at most
    TWO rows (limit after distinct) — the full state is only scanned by
    the returned lazy plan, once, when the caller executes it. No raw
    event is ever re-read; cost is |windows| x |populated bins| regardless
    of stream history. Output: (event_type, bucket, q, est)."""
    from dumpr_spark.functions import sketches as sk

    m = _read_minute_rows(sink, grain).where(F.col("bins").isNotNull())
    widths = [r["bw"] for r in m.select("bw").distinct().limit(2).collect()]
    if len(widths) > 1:
        raise ValueError(f"mixed persisted bin widths in one state dir: {widths}")
    if widths == [None]:
        if legacy_bin_width is None:
            raise ValueError(
                "state predates the persisted bin width; pass legacy_bin_width"
            )
        widths = [float(legacy_bin_width)]
    bw = widths[0] if widths else 1.0  # empty state: plan below yields 0 rows
    long_bins = m.select(
        "event_type",
        F.date_trunc(grain, "w_start").alias("bucket"),
        F.posexplode("bins").alias("bin", "c"),
    ).where(F.col("c") > 0)
    merged = sk.merge_bins(long_bins, ["event_type", "bucket"])
    return sk.histogram_quantiles(merged, qs, ["event_type", "bucket"], bw)


def read_rollup_distinct(sink: MergeSink, grain: str = "hour") -> DataFrame:
    """Distinct-count estimates at any grain from an HLL-enabled rollup:
    `hll_union_agg` over the persisted per-minute sketches — the
    incremental form of agg_hll_mergeable's daily-sketch pattern. Sketch
    union is associative/commutative, so any grain re-derives from minute
    partials without touching raw events. Output: (event_type, bucket,
    est_distinct)."""
    m = _read_minute_rows(sink, grain)
    return (
        m.where(F.col("hll").isNotNull())
        .groupBy("event_type", F.date_trunc(grain, "w_start").alias("bucket"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.unbase64(F.col("hll")))
            ).alias("est_distinct")
        )
    )
