#!/usr/bin/env python
"""Shuffle-growth evidence: per-query shuffle WRITE bytes/records at sf0.01
vs sf0.1 for the shuffle-bearing headline queries.

SCALE.md claims the big shuffles carry hashes/keys rather than payloads; this
script turns that prose into numbers: if the claim holds, bytes-per-record
stays flat (and small) as the data grows 10x, and total shuffle bytes grows
~linearly with input rows — no quadratic blowup, no payload amplification.

Metrics come from the stage-level REST API (spark.ui.enabled for this script
only; the engine default keeps it off): cumulative shuffle write bytes /
records are snapshotted before and after each query, the diff is the query's
own traffic. Each query runs once per sf AFTER a warm-up pass so JIT/codegen
noise doesn't pollute the (deterministic) byte counts.

Usage: python scripts/shuffle_curve.py
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The shuffle-bearing headliners (the scan-bound rest shuffle only
# metadata-sized aggregates): the CDC fold, the LSH band shuffle, a star
# join, a partitioned window, and a sessionization (window + groupBy) —
# plus the wave-3 aggregating ops whose docstrings claim sketch-/bar-sized
# shuffles (quantile histogram, OHLC bars, term-filtered BM25).
QUERIES = [
    "cdc_materialize",
    "dedup_minhash_lsh",
    "join_inner_star",
    "win_topk_per_group",
    "stream_session_window",
    "agg_quantile_mergeable",
    "rollup_ohlc",
    "text_bm25_topk",
    "dedup_paragraphs",
    # r5: the two join-heavy r4-late ops (VERDICT r4 #7) — degree-ordered
    # wedge joins and the 4x16-bit band self-join
    "graph_triangle_count",
    "dedup_simhash_banded",
    # r6: the new shuffle-bearing ops — the salted two-phase fold (one
    # extra cell-winner shuffle vs cdc_materialize), the candidate-bounded
    # sketch-calibration joins, the banded-vocab pair join, and the
    # event-differencing union + running sum
    "cdc_materialize_salted",
    "dedup_minhash_accuracy",
    "text_pmi_cooccurrence",
    "orders_backlog_timeseries",
]


def _stage_totals(ui: str, app_id: str) -> tuple[int, int, int]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    wb = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteRecords", 0) for s in stages)
    rb = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return wb, wr, rb


def main():
    from dumpr_spark.queries import REGISTRY
    from dumpr_spark.session import get_spark

    spark = get_spark("shuffle_curve", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    results: dict[str, dict[str, dict[str, float]]] = {}
    for sf in ("0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        for name in QUERIES:
            fn = REGISTRY[name].fn
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            before = _stage_totals(ui, app_id)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            after = _stage_totals(ui, app_id)
            wb, wr = after[0] - before[0], after[1] - before[1]
            results.setdefault(name, {})[sf] = {
                "write_mb": round(wb / 1e6, 3),
                "write_records": wr,
                "bytes_per_rec": round(wb / wr, 1) if wr else 0.0,
            }
            print(json.dumps({"query": name, "sf": sf, **results[name][sf]}))

    print("\n| query | sf0.01 MB (rec) | sf0.1 MB (rec) | bytes/rec 0.01 -> 0.1 | MB growth |")
    print("|---|---|---|---|---|")
    for name in QUERIES:
        a, b = results[name]["0.01"], results[name]["0.1"]
        growth = round(b["write_mb"] / a["write_mb"], 1) if a["write_mb"] else float("inf")
        print(
            f"| {name} | {a['write_mb']} ({a['write_records']}) "
            f"| {b['write_mb']} ({b['write_records']}) "
            f"| {a['bytes_per_rec']} -> {b['bytes_per_rec']} | {growth}x |"
        )


if __name__ == "__main__":
    main()
