"""Streaming as-of enrichment — the stateful twin of `operators/asof.asof_join`.

For each left (fact) row, attach the latest right (dimension-update) row
with right_time <= left_time per key, across an unbounded stream. The
reference's closest analog is the binlog filename carry
(/root/reference/src/dumpr/stream.clj:56-74): stamp each event with the
most recent marker seen — state per key is exactly ONE carried payload.

State per key: (r_time, r_payload) — the single LATEST right row seen so
far (its event time plus a JSON-encoded payload), two scalars regardless
of stream length. Per micro-batch the fold is vectorized: the batch's
right rows (plus the carried state row) asof-merge against the batch's
left rows with `pd.merge_asof` — the same backward/inclusive/tolerance
semantics as the batch operator — then state advances to the max-time
right row.

Contract and divergence from the batch twin (documented, not accidental):
the state holds only the LATEST right version. A left row that arrives in
a LATER micro-batch than a right update that postdates it (left_time <
state r_time) would need an older right version the state no longer holds
— it enriches as NULL rather than wrongly attaching the newer payload
(r_time <= left_time is enforced against state too). With per-key
in-order feeds (the CDC/binlog shape) streaming output == batch output;
the batch twin at rest is the replay/repair path for disordered feeds —
the same fence philosophy as `streaming_interval_merge`. The repair is
demonstrated, not just named: re-enrich the NULL-enriched rows through
`operators/asof.asof_join` at rest and the union equals the all-batch
answer (`test_streaming_asof_enrich_out_of_order_repair_path`).

Scale shape: one shuffle of both streams on the join key; state is O(keys)
with a single payload per key (contrast a watermarked stream-stream join,
whose state buffers every right version inside the watermark). Payload
values must be JSON-scalar (numeric/string/bool/null) — the state schema
stays fixed regardless of which right columns ride along.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ByteType, IntegerType, LongType, ShortType, StringType, StructField,
    StructType,
)

_ASOF_STATE = StructType(
    [
        StructField("r_time", LongType(), True),
        StructField("r_payload", StringType(), True),  # JSON object
    ]
)


def _require_int_time(df: DataFrame, col: str) -> None:
    dt = df.schema[col].dataType
    if not isinstance(dt, (LongType, IntegerType, ShortType, ByteType)):
        raise TypeError(
            f"streaming_asof_enrich: {col} must be an integer column "
            f"(epoch ms), got {dt.simpleString()} — cast with unix_millis"
        )


def streaming_asof_enrich(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Enrich streaming `left` rows with the latest `right` row whose
    right_time <= left_time per `on` key (NULL right columns when no such
    row exists, or when it is staler than `tolerance_ms`).

    Both inputs are streaming DataFrames sharing the key column `on`;
    time columns must be integer epoch-ms (same contract as
    `streaming_interval_merge`). `right_cols` defaults to every right
    column except the key and time, and must not collide with left's
    column names. Ties on equal timestamps: the right row at exactly
    left_time wins (<=, matching `operators/asof.asof_join` and DuckDB
    ASOF JOIN); among right rows tied on (key, time) the
    lexicographically-greatest payload wins, the batch operator's
    deterministic tie-break. Null-timed rows drop on both sides.
    """
    _require_int_time(left, left_time)
    _require_int_time(right, right_time)
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"streaming_asof_enrich: right_cols collide with left columns: "
            f"{sorted(clash)} — alias them on the right stream first"
        )
    reserved = {"_t", "_is_left"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"streaming_asof_enrich: column names {sorted(reserved)} are "
            f"reserved internal tags — rename them on the input streams"
        )
    left_cols = [c for c in left.columns if c not in (on, left_time)]

    out_schema = StructType(
        [StructField(on, left.schema[on].dataType, True),
         StructField(left_time, LongType(), True)]
        + [StructField(c, left.schema[c].dataType, True) for c in left_cols]
        + [StructField(c, right.schema[c].dataType, True) for c in right_cols]
    )

    # null-timed rows drop on BOTH sides (same discipline as
    # streaming_interval_merge's null contract): a null event time has no
    # place on the as-of axis, and NaN keys break the vectorized merge
    l_tagged = left.where(F.col(left_time).isNotNull()).select(
        F.col(on),
        F.col(left_time).cast("long").alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
    )
    r_tagged = right.where(F.col(right_time).isNotNull()).select(
        F.col(on),
        F.col(right_time).cast("long").alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in right_cols],
    )

    out_names = [f.name for f in out_schema.fields]

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        r_time, r_payload = state.get if state.exists else (None, None)
        rows = pd.concat(list(pdfs))
        k = key[0]

        rights = rows[rows["_is_left"] == 0][["_t", *right_cols]]
        carried = []
        if r_time is not None:
            carried.append({"_t": int(r_time), **json.loads(r_payload)})
        batch_rights = pd.concat(
            [pd.DataFrame(carried, columns=["_t", *right_cols]), rights]
        ) if carried else rights
        # sort by (_t, payload): merge_asof takes the LAST matching row, so
        # the greatest payload wins a timestamp tie — the batch tie-break.
        # na_position="first" matches Spark's nulls-first asc struct order:
        # a null payload must LOSE a tie to any non-null one (review pin:
        # pandas defaults NaN last, which would let nulls win and then be
        # carried forward in state)
        batch_rights = batch_rights.sort_values(
            ["_t", *right_cols], na_position="first"
        )

        lefts = rows[rows["_is_left"] == 1][["_t", *left_cols]]
        if len(lefts):
            lefts = lefts.sort_values("_t", kind="stable")
            if len(batch_rights):
                merged = pd.merge_asof(
                    lefts,
                    batch_rights,
                    on="_t",
                    direction="backward",
                    tolerance=tolerance_ms,
                    allow_exact_matches=True,
                )
            else:
                merged = lefts.copy()
                for c in right_cols:
                    merged[c] = None
            merged = merged.rename(columns={"_t": left_time})
            merged.insert(0, on, k)
            # Arrow-safe nulls: unmatched numeric payloads become NaN under
            # merge_asof's float upcast; object dtype keeps them as None
            for c in right_cols:
                col = merged[c].astype("object")
                merged[c] = col.where(pd.notna(col), None)
            out = merged[out_names]
        else:
            out = pd.DataFrame(columns=out_names)

        if len(batch_rights):
            last = batch_rights.iloc[-1]
            r_time = int(last["_t"])
            r_payload = json.dumps(
                {c: (None if pd.isna(last[c]) else _py(last[c])) for c in right_cols}
            )
        state.update((r_time, r_payload))
        yield out

    return (
        l_tagged.unionByName(r_tagged)
        .groupBy(on)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_ASOF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _py(v):
    """numpy scalar -> plain python for json round-trip fidelity."""
    return v.item() if hasattr(v, "item") else v
