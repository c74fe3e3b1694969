"""Cross-engine identity pins for the r13 IVF-PQ derivation rules.

The registered builders derive cells in Python (`_ivfpq_derive_cells`) and
the oracle derives them in SQL (the `ncells` CTE); the correctness gate
only exercises the corpus sizes the testdata happens to have, so these
tests sweep the arithmetic itself — both rounding twins and the shortlist
rule — over a wide range of n, including near-perfect-square and
half-way-point edges where a rounding-mode mismatch would first diverge.
No SparkSession needed (DuckDB evaluates the SQL side)."""

from __future__ import annotations

import duckdb
import pytest

from dumpr_spark.queries.llm import (
    _IVFPQ_SHORTLIST,
    _ivfpq_derive_cells,
    _ivfpq_serve_shortlist,
    _ivfpq_train_sample_mod,
)


def _edge_ns():
    ns = set(range(1, 300))
    for k in (22, 45, 141, 283, 1000, 31623):
        for d in (-2, -1, 0, 1, 2):
            # perfect squares and their neighbors (sqrt lands exactly on
            # an integer) plus k^2 + k (sqrt lands nearest the .5 point)
            ns.add(max(1, k * k + d))
            ns.add(max(1, k * k + k + d))
    ns.add(10**9)
    return sorted(ns)


def test_derive_cells_matches_sql_twin_everywhere():
    con = duckdb.connect()
    for n in _edge_ns():
        sql = con.execute(
            f"SELECT GREATEST(1, CAST(FLOOR(SQRT({n}) + 0.5) AS INT))"
        ).fetchone()[0]
        assert _ivfpq_derive_cells(n) == sql, n


def test_serve_shortlist_matches_sql_twin_everywhere():
    con = duckdb.connect()
    for n in _edge_ns():
        cells = _ivfpq_derive_cells(n)
        sql = con.execute(
            f"SELECT GREATEST({_IVFPQ_SHORTLIST}, "
            f"CAST(CEIL({n} * 1.0 / {cells}) AS BIGINT))"
        ).fetchone()[0]
        assert _ivfpq_serve_shortlist(n, cells=cells) == sql, n


def test_derive_cells_is_sqrt_rounded():
    # the rule IS round-half-up of sqrt: cells^2 is the closest square
    for n in _edge_ns():
        c = _ivfpq_derive_cells(n)
        assert c >= 1
        if c > 1:
            assert abs(c * c - n) <= abs((c - 1) * (c - 1) - n)
        assert abs(c * c - n) <= abs((c + 1) * (c + 1) - n)


def test_train_sample_mod_rule():
    # budget = max(5000, 100*cells); engage only at mod >= 4 (the r13
    # measured threshold: 2-3x thinning costs more than it saves)
    assert _ivfpq_train_sample_mod(500, 22) is None      # n << budget
    assert _ivfpq_train_sample_mod(20_000, 141) is None  # mod would be 1
    assert _ivfpq_train_sample_mod(80_000, 283) is None  # mod 2: below gate
    assert _ivfpq_train_sample_mod(80_000, 141) == 5     # engages
    assert _ivfpq_train_sample_mod(10**9, 31_623) == 316  # at-volume shape
    # the PQ floor binds when cells are few
    assert _ivfpq_train_sample_mod(100_000, 8) == 20     # budget 5000


@pytest.mark.slow
def test_trainer_sampling_recall_envelope_at_engaged_geometry(spark, tmp_path):
    """CI twin of the r14 engagement-point probe (r14 verdict item 5: the
    -0.025 recall PASS lived in a one-off 250k-vector /tmp run — a future
    sampling edit would invalidate it silently). Scaled-down deterministic
    corpus, SAME generator arithmetic as scripts/make_ann_engage_corpus.py
    (xxhash64 mixture of 200 soft clusters; noise 1.5 here so recall is
    off the 1.0 ceiling and the bound has teeth — at 0.5 this size
    saturates), at the rule's own engaged geometry: n=25k, cells=50 ->
    budget max(5000, 100*50) = 5000, mod = 5 = exactly 100 sampled
    points/cell, the regime the r13 budget correction was FOR. Asserts
    (a) the rule engages at mod 5 here (a budget/gate edit moves this),
    (b) the full-trained recall is in a sane band (the geometry did not
    trivialize), and (c) the rule-sampled recall is within the committed
    epsilon 0.03 of full-trained — measured delta 0.000 at this geometry
    (r15), while a STARVED dial (mod=50, ~10 points/cell) measured
    -0.044, below the bound, so a sampling-path regression (seed forcing
    dropped, sample biased, budget shrunk) fails here instead of only in
    a probe rerun. Everything is deterministic by the repo's exact-replay
    discipline (hash-derived corpus, eps-rounded Lloyd, positionally
    assembled ADC)."""
    import os

    from pyspark.sql import functions as F

    from dumpr_spark.functions import similarity as sim
    from dumpr_spark.queries.llm import (
        _ivfpq_index, _ivfpq_query, _ivfpq_serve_shortlist,
    )

    n, centers, noise, dim, cells = 25_000, 200, 1.5, 64, 50
    assert _ivfpq_train_sample_mod(n, cells) == 5

    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(f"cast(pmod(id, {centers}) as int)").alias("label"),
    ).withColumn(
        "embedding",
        F.expr(
            f"transform(sequence(1, {dim}), j -> cast("
            f"((pmod(xxhash64('c', cast(label as bigint), j), 2001) / 1000.0) - 1.0) "
            f"+ {noise} * ((pmod(xxhash64('n', vec_id, j), 2001) / 1000.0) - 1.0) "
            f"as float))"
        ),
    ).select("vec_id", "embedding", "label")
    sf_dir = str(tmp_path)
    corpus.repartition(4).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = e.where(F.col("vec_id") < 32)
    exact = (
        sim.brute_force_topk(e.select("vec_id", "embedding"),
                             q.select("vec_id", "embedding"),
                             k=5, round_eps=1e-9)
        .select("q_id", "n_id").localCheckpoint(eager=False)
    )
    tot = exact.count()
    sl = _ivfpq_serve_shortlist(n, cells=cells)

    def recall(mod):
        index = _ivfpq_index(spark, sf_dir, train_sample_mod=mod, cells=cells)
        hits = (
            _ivfpq_query(*index, nprobe=4, shortlist=sl)
            .where(F.col("rank") <= 5).select("q_id", "n_id")
            .join(exact, ["q_id", "n_id"]).count()
        )
        return hits / tot

    full = recall(None)
    sampled = recall(5)
    assert 0.85 <= full <= 1.0, f"geometry drifted: full-trained {full=}"
    assert sampled >= full - 0.03, (
        f"rule-sampled trainer recall {sampled} fell more than the "
        f"committed 0.03 below full-trained {full} — the sampling path "
        "regressed (check seed forcing, sample hash, budget arithmetic)"
    )
