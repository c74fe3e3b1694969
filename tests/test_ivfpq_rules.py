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
