"""Engine facade: the user-facing surface a dumpr user would switch to.
Covers catalog registration, SQL passthrough, the ordered multi-table
snapshot (R1+R12), end-to-end snapshot -> changes -> materialize, and
resume-position capture (R13)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_sql_passthrough_over_registered_tables(engine):
    out = engine.sql(
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment"
    ).collect()
    assert sum(r["n"] for r in out) == engine.table("customer").count()


def test_snapshot_changes_preserves_table_order(engine):
    ch = engine.snapshot_changes({"region": "r_regionkey", "nation": "n_nationkey"})
    seqs = ch.groupBy("tbl").agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()
    rng = {r["tbl"]: (r["lo"], r["hi"]) for r in seqs}
    # strict order: every region seq precedes every nation seq (core.clj:85-89)
    assert rng["region"][1] < rng["nation"][0]
    assert ch.where(F.col("op") != "upsert").count() == 0


def test_snapshot_table_order_survives_high_partition_counts(engine, spark):
    """Cross-table seq order must hold at production partition counts.

    monotonically_increasing_id is (partitionId << 33) | offset, so any row in
    partition >= 128 exceeds 2^40 — the old 2^40 stride let a late partition of
    table 0 outrank ALL of table 1 (invisible at local[32], real on a cluster).
    Force partition ids past 128 and assert the R12 contract (core.clj:85-89).
    """
    from dumpr_spark.cdc.envelope import snapshot_to_changes

    region = engine.table("region").repartition(300)  # pids up to 299 > 128
    nation = engine.table("nation").repartition(300)
    ch = snapshot_to_changes(region, "region", "r_regionkey", table_seq=0).unionByName(
        snapshot_to_changes(nation, "nation", "n_nationkey", table_seq=1)
    )
    rng = {
        r["tbl"]: (r["lo"], r["hi"])
        for r in ch.groupBy("tbl").agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()
    }
    assert rng["region"][1] < rng["nation"][0]
    # the forced repartition really produced >2^40 within-table components
    assert rng["region"][1] > (1 << 40)


def test_snapshot_materialize_roundtrip(engine):
    """Materializing a pure snapshot returns exactly the source rows."""
    src = engine.table("nation")
    ch = engine.snapshot_changes({"nation": "n_nationkey"})
    state = engine.materialize(ch)
    assert state.count() == src.count()
    got = {
        r["id"]: json.loads(r["content"])["n_name"] for r in state.collect()
    }
    want = {str(r["n_nationkey"]): r["n_name"] for r in src.collect()}
    assert got == want


def test_snapshot_then_stream_updates(engine, spark):
    """Snapshot + later change envelope folds to updated state (the flagship
    use pattern: load_dir -> snapshot_changes -> union updates -> materialize)."""
    from dumpr_spark.cdc.envelope import ENVELOPE_SCHEMA

    snap = engine.snapshot_changes({"region": "r_regionkey"})
    max_seq = snap.agg(F.max("seq")).first()[0]
    updates = spark.createDataFrame(
        [
            ("upsert", "region", "0", json.dumps({"r_regionkey": 0, "r_name": "REBRANDED"}),
             None, "binlog.000002", 999, max_seq + 1),
            ("delete", "region", "1", None, None, "binlog.000002", 1000, max_seq + 2),
        ],
        ENVELOPE_SCHEMA,
    )
    state = engine.materialize(snap.unionByName(updates))
    rows = {r["id"]: r for r in state.collect()}
    assert json.loads(rows["0"]["content"])["r_name"] == "REBRANDED"
    assert "1" not in rows
    assert state.count() == engine.table("region").count() - 1

    pos = engine.next_position(snap.unionByName(updates))
    assert pos == {"file": "binlog.000002", "position": 1000}


def test_engine_temporal_surface(engine):
    """Engine.history / materialize_asof: the SCD2 view's open intervals
    reproduce materialize, and the as-of view at a mid-log cutoff equals a
    materialize over the truncated log."""
    from pyspark.sql import functions as F

    changes = engine.snapshot_changes({"region": "r_regionkey", "nation": "n_nationkey"})
    hist = engine.history(changes)
    cur = hist.where(F.col("is_current")).select("tbl", "id", "content", "seq")
    mat = engine.materialize(changes).select("tbl", "id", "content", "seq")
    assert sorted(map(tuple, cur.collect())) == sorted(map(tuple, mat.collect()))

    cutoff = changes.agg(F.expr("percentile_approx(seq, 0.5)")).collect()[0][0]
    asof = engine.materialize_asof(changes, cutoff).select("tbl", "id", "seq")
    trunc = engine.materialize(changes.where(F.col("seq") <= cutoff)).select("tbl", "id", "seq")
    assert sorted(map(tuple, asof.collect())) == sorted(map(tuple, trunc.collect()))
    # the as-of view must not see any change past the cutoff
    assert asof.where(F.col("seq") > cutoff).count() == 0


def test_engine_analytics_facade(engine, spark, sf_dir):
    from dumpr_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    assert engine.dedup_exact(docs).count() <= docs.count()

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(emb.vec_id < 3)
    brute = engine.similar_topk(emb, q, k=2)
    assert brute.count() == 6
    # n_planes=0 degenerates to brute force (one bucket); id sets agree even
    # though lsh_topk eps-rounds sims and brute's default does not
    lsh = engine.similar_topk(emb, q, k=2, method="lsh", n_planes=0)
    assert {(r["q_id"], r["n_id"]) for r in lsh.collect()} == {
        (r["q_id"], r["n_id"]) for r in brute.collect()
    }

    ev = load_table(spark, sf_dir, "events")
    qs = engine.quantile_sketch(ev, qs=(0.5,))
    rows = qs.collect()
    assert len(rows) == 5 and all(r["q"] == 0.5 and r["est"] is not None for r in rows)

    import pytest

    with pytest.raises(ValueError):
        engine.similar_topk(emb, q, method="nope")


def test_engine_paragraph_dedup_and_debezium_egress(engine, spark, sf_dir):
    """Facade pass-throughs: paragraph dedup keeps exactly one copy of a
    duplicated passage; publish_debezium emits parseable wire JSON."""
    boiler = " ".join(f"p{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, boiler), (2, boiler)], "doc_id long, text string"
    )
    out = engine.dedup_paragraphs(docs).collect()
    assert sorted((r["doc_id"], r["keep"]) for r in out) == [(1, True), (2, False)]

    import datetime as dt

    env = spark.createDataFrame(
        [("upsert", "users", "1", '{"pk":"1"}', dt.datetime(2026, 1, 1),
          "bin.000001", 4, (1 << 42) + (4 << 10))],
        "op string, tbl string, id string, content string, ts timestamp, "
        "next_file string, next_position long, seq long",
    )
    wire = engine.publish_debezium(env, db="appdb").first()["value"]
    import json

    payload = json.loads(wire)["payload"]
    assert payload["op"] == "u" and payload["after"] == {"pk": "1"}
    assert payload["source"]["table"] == "users" and payload["source"]["pos"] == 4


def test_engine_simhash_pairs_and_weighted_median(engine, spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "x y z q w r t u")],
        "doc_id long, text string",
    )
    pairs = {(r["a"], r["b"]): r["hamming"] for r in engine.dedup_simhash_pairs(docs).collect()}
    assert pairs == {(1, 2): 0}  # identical docs pair at distance 0; doc 3 pairs with nobody

    wdf = spark.createDataFrame(
        [("g", 1, 10.0, 1.0), ("g", 2, 20.0, 8.0), ("g", 3, 30.0, 1.0)],
        "grp string, rid long, v double, w double",
    )
    row = engine.weighted_median(wdf, ["grp"], "v", "w", tiebreak_cols=["rid"]).first()
    assert row["w_median"] == 20.0 and row["total_weight"] == 10.0


def test_engine_asof_ntile_and_interval_merge(engine, spark):
    """The r5 facade additions: asof (with tolerance), two-phase global
    ntile, and interval coalescing — semantics checks on hand-built frames
    (the registry queries exercise them on the full tables)."""
    from datetime import datetime

    # asof with tolerance: the 2h-old quote nulls out under a 1h bound
    trades = spark.createDataFrame(
        [("A", datetime(2026, 1, 1, 10, 0), 1.0)], "sym STRING, t TIMESTAMP, px DOUBLE"
    )
    quotes = spark.createDataFrame(
        [("A", datetime(2026, 1, 1, 8, 0), 9.9)], "sym STRING, qt TIMESTAMP, bid DOUBLE"
    )
    assert engine.asof(trades, quotes, "sym", "t", "qt").first()["bid"] == 9.9
    assert (
        engine.asof(trades, quotes, "sym", "t", "qt", tolerance="1 HOUR").first()["bid"]
        is None
    )

    # ntile: 4 rows into 2 tiles, descending — top half tile 1
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 5)], "id LONG, v DOUBLE")
    tiles = {r["id"]: r["q"] for r in engine.ntile(df, 2, "v", "id", out_col="q").collect()}
    assert tiles == {4: 1, 3: 1, 2: 2, 1: 2}

    # merge_intervals: [0,10],[5,15] merge; [20,30] stays; touching [30,35]
    # merges into it (closed-interval convention); key isolation holds
    iv = spark.createDataFrame(
        [("a", 0, 10), ("a", 5, 15), ("a", 20, 30), ("a", 30, 35), ("b", 5, 6)],
        "k STRING, s LONG, e LONG",
    )
    merged = {
        (r["k"], r["merged_start"]): (r["merged_end"], r["n_intervals"])
        for r in engine.merge_intervals(iv, "k", "s", "e").collect()
    }
    assert merged == {("a", 0): (15, 2), ("a", 20): (35, 2), ("b", 5): (6, 1)}


def test_engine_facade_round6_surface(spark, sf_dir):
    """The round-6 additions ride the public facade: materialize_salted
    matches materialize through Engine, and train_ivf returns centroids
    shaped for similar_topk's IVF path."""
    from dumpr_spark.engine import Engine

    eng = Engine(spark).load_dir(sf_dir)
    changes = eng.snapshot_changes({"orders": "o_orderkey"})
    plain = {(r["tbl"], r["id"]): r["seq"] for r in eng.materialize(changes).collect()}
    salted = {
        (r["tbl"], r["id"]): r["seq"]
        for r in eng.materialize_salted(changes, salt=4).collect()
    }
    assert plain == salted and plain

    emb = eng.table("embeddings")
    cents = eng.train_ivf(emb, k=4, max_iter=2)
    assert cents.columns == ["cent_id", "cent_vec"]
    assert cents.count() == 4
    topk = eng.similar_topk(
        emb, emb.where(F.col("vec_id") < 3), k=2, method="ivf", centroids=cents
    )
    assert topk.count() > 0


def test_engine_facade_debias_and_bloom_tiers(spark, sf_dir):
    """The session-2 round-6 additions ride the public facade: the
    trained top direction feeds remove_direction (orthogonal residuals),
    and both bloom probe tiers keep identical rows through Engine."""
    from dumpr_spark.engine import Engine
    from dumpr_spark.functions.similarity import dot, l2_norm

    eng = Engine(spark).load_dir(sf_dir)
    emb = eng.table("embeddings").select("vec_id", "embedding")

    u = eng.top_direction(emb, iters=2)
    assert len(u) == 64
    deb = eng.remove_direction(emb, u, out_col="r", renormalize=False)
    ulit = F.array(*[F.lit(float(x)) for x in u])
    worst = deb.agg(F.max(F.abs(dot(F.col("r"), ulit)))).first()[0]
    assert worst < 1e-9

    keys = emb.where(F.col("vec_id") % 7 == 0).select("vec_id")
    bloom = eng.bloom_filter(keys, "vec_id", m_bits=1 << 12, k=4)
    lit_ids = sorted(
        r["vec_id"] for r in eng.bloom_semi_join(emb, bloom, "vec_id").collect()
    )
    arw_ids = sorted(
        r["vec_id"]
        for r in eng.bloom_semi_join_arrow(emb, bloom, "vec_id").collect()
    )
    assert lit_ids == arw_ids
    assert {r["vec_id"] for r in keys.collect()} <= set(lit_ids)
