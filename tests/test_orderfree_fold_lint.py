"""Registry-wide lint for the order-sensitive-aggregate flake class
(r13 verdict item 2: make the r13 audit structural, not a commit note).

The class, found LIVE twice (r7 and r13, both in agg_pareto_abc): a
floating-point SUM/AVG windowed over PARTITION BY with NO ORDER BY is
fold-order-FREE — Spark re-adds the addends in shuffle ARRIVAL order, so
its last ulp varies run-to-run on identical code and data. Harmless in a
rounded output column; catastrophic when the value feeds a hard decision
(CASE class edge, argmax pick, threshold compare): the ulp flips whole
rows and the query flakes at ~1e-3..1e-4 per sweep (SCALE.md r13
postscript quantifies the collision arithmetic). The r13 fix replaced
pareto's partition total with MAX(cum_rev) — the last value of the
ORDER-pinned running sum, fold-order-independent — and the r13 audit
hand-checked every other order-free window SUM in the registry. This test
IS that audit, re-run on every suite: any order-free partition SUM/AVG in
any registered oracle must carry a written justification below, exactly
like tests/test_plan_lint.py's BNLJ allowlist, so a future registration
cannot silently reintroduce the class.

The scan is over the ORACLE SQL text: the gate forces the Spark builder
and the oracle to be semantically identical, so an order-free window sum
on one side exists on the other (the r7/r13 flakes were both visible in
the oracle text). MIN/MAX/COUNT windows are exempt by construction —
they are fold-order-independent regardless of type. The scan also covers
the variance class (STDDEV/VAR/COVAR/CORR/REGR_*, and AVG) — same
parallel-merge ulp mechanism, one extra merge term (the cross-partition
delta^2), same downstream amplifier.
"""

from __future__ import annotations

import re

_FUNCS = (
    r"SUM|AVG|STDDEV_SAMP|STDDEV_POP|STDDEV|VAR_SAMP|VAR_POP|VARIANCE"
    r"|CORR|COVAR_SAMP|COVAR_POP|REGR_[A-Z]+"
)

# (query name, func, normalized summand) -> why this order-free fold can
# never flip a downstream decision. An entry here is a CLAIM the author
# makes in writing; delete the query's window or justify it — never
# blanket-allow.
ALLOWLIST: dict[tuple[str, str, str], str] = {
    ("agg_quantile_mergeable", "SUM", "c"): (
        "c is a merged per-(event_type, bin) COUNT(*) (BIGINT) — integer "
        "addends, exact in any fold order (no ulp to vary), so the "
        "downstream `cum >= q * n` pick reads one deterministic total."
    ),
    ("events_markov_transitions", "SUM", "n"): (
        "n is a per-(prev, next) transition COUNT(*) — integer addends, "
        "exact in any fold order."
    ),
    ("agg_weighted_median", "SUM", "l_quantity"): (
        "l_quantity is a whole number (TPC-H: 1..50; verified 0 fractional "
        "parts in the testdata) stored as a double: every addend and "
        "partial sum is an exact integer far below 2^53, so the fold is "
        "exact in any order and the `cum >= total / 2.0` threshold scan "
        "reads one deterministic total."
    ),
    ("udf_grouped_map_zscore", "AVG", "c_acctbal"): (
        "the avg feeds the zscore NUMERATOR only, and the output is "
        "eps-rounded to 4dp before the gate's hash — a last-ulp wobble "
        "(~1e-13 relative) is 9 orders of magnitude under the rounding "
        "step and no hard decision (CASE/filter/rank) reads the value."
    ),
    ("udf_grouped_map_zscore", "STDDEV_SAMP", "c_acctbal"): (
        "the stddev feeds NULLIF(.., 0) — a hard zero-compare — but the "
        "compare is ulp-robust: the only input that makes it fire is an "
        "all-equal group, where every per-partition M2 term is EXACTLY 0 "
        "(x - mean == 0 in floats) and the merge's cross-partition "
        "delta^2 is exactly 0 too (equal means), so the fold is 0 in any "
        "arrival order; for non-degenerate groups the value only feeds "
        "the 4dp-rounded z denominator."
    ),
}


def _strip_sql_comments(sql: str) -> str:
    """Drop `--` line comments — but NOT a `--` inside a single-quoted
    SQL string literal (r14 ADVICE item 3: `WHERE sep = '--'` followed by
    an order-free window SUM on the same line was silently excluded from
    the scan). Small state machine; '' escapes inside literals fall out
    naturally (the second quote reopens literal state for one char, which
    only ever HIDES a quote-adjacent `--` inside the literal — the safe
    direction). Line comments only (the registry uses no /* */ blocks)."""
    out, i, n, in_str = [], 0, len(sql), False
    while i < n:
        c = sql[i]
        if in_str:
            if c == "'":
                in_str = False
            out.append(c)
            i += 1
        elif c == "'":
            in_str = True
            out.append(c)
            i += 1
        elif c == "-" and sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j == -1 else j
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _match_parens(s: str, i: int) -> int:
    """Index of the ')' closing the '(' at s[i]."""
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return j
    return len(s)


def order_free_partition_aggs(sql: str) -> list[tuple[str, str]]:
    """All (func, summand) pairs in `sql` of the form
    <float-foldable agg>(<expr>) [FILTER (WHERE ...)] OVER (<spec>) or
    OVER <named window>, where <spec> has PARTITION BY and no ORDER BY —
    the fold-order-free shape, for SUM/AVG and the variance class.
    Paren-matching scanner (nesting-safe), case insensitive,
    comment-stripped; named windows (WINDOW w AS (...)) are resolved so
    `OVER w` cannot smuggle the shape past the lint."""
    s = _strip_sql_comments(sql)
    # named-window definitions: WINDOW w AS (spec)[, w2 AS (spec2) ...]
    named = {}
    for m in re.finditer(r"\bWINDOW\s+(\w+)\s+AS\s*\(", s, re.I):
        name, start = m.group(1), m.end() - 1
        while True:
            end = _match_parens(s, start)
            named[name] = s[start + 1:end]
            m2 = re.match(r"\s*,\s*(\w+)\s+AS\s*\(", s[end + 1:], re.I)
            if not m2:
                break
            name = m2.group(1)
            start = end + 1 + m2.end() - 1
    hits = []
    for m in re.finditer(r"\b(" + _FUNCS + r")\s*\(", s, re.I):
        j = _match_parens(s, m.end() - 1)
        arg = s[m.end():j]
        rest = s[j + 1:]
        # optional FILTER (WHERE ...) between the agg and OVER
        mf = re.match(r"\s*FILTER\s*\(", rest, re.I)
        if mf:
            jf = _match_parens(rest, mf.end() - 1)
            rest = rest[jf + 1:]
        spec = None
        m2 = re.match(r"\s*OVER\s*\(", rest, re.I)
        if m2:
            k = m2.end() - 1
            spec = rest[k + 1:_match_parens(rest, k)]
        else:
            m3 = re.match(r"\s*OVER\s+(\w+)", rest, re.I)
            if m3:
                spec = named.get(m3.group(1))
                assert spec is not None, (
                    f"OVER {m3.group(1)} references an undefined/unparsed "
                    "named window — extend the lint's WINDOW-clause parser"
                )
        if spec is None:
            continue
        if (re.search(r"\bPARTITION\s+BY\b", spec, re.I)
                and not re.search(r"\bORDER\s+BY\b", spec, re.I)):
            hits.append((m.group(1).upper(), re.sub(r"\s+", " ", arg).strip()))
    return hits


def test_registry_order_free_window_folds_all_justified():
    from dumpr_spark.queries.base import oracle_sql

    flagged = set()
    for name, sql in oracle_sql().items():
        for fn, arg in order_free_partition_aggs(sql):
            flagged.add((name, fn, arg))
    unjustified = flagged - set(ALLOWLIST)
    assert not unjustified, (
        "order-free float window fold(s) without a written justification "
        f"(the agg_pareto_abc flake class, bitten live in r7 AND r13): "
        f"{sorted(unjustified)} — pin the fold with ORDER BY and take the "
        "last running value (MAX of the cumulative sum), or add an "
        "ALLOWLIST entry in tests/test_orderfree_fold_lint.py explaining "
        "why this fold can never flip a downstream decision"
    )
    stale = set(ALLOWLIST) - flagged
    assert not stale, (
        f"stale ALLOWLIST entries (window no longer in the oracle): "
        f"{sorted(stale)} — delete them so the allowlist stays a live claim"
    )


def test_lint_catches_the_prefix_pareto_regression():
    """The seeded regression the r13 verdict asks for: the PRE-fix pareto
    shape — an order-free float partition total feeding a CASE class
    edge — must be flagged. (The shipped oracle pins the fold with
    ORDER BY and reads MAX(cum_rev); this is what it looked like before.)"""
    pre_fix = """
    WITH ranked AS (
      SELECT n_name, l_partkey, revenue,
             SUM(revenue) OVER (PARTITION BY n_name
                                ORDER BY revenue DESC, l_partkey) AS cum_rev,
             SUM(revenue) OVER (PARTITION BY n_name) AS total_rev
      FROM part_revenue
    )
    SELECT n_name, l_partkey,
           CASE WHEN cum_rev / total_rev <= 0.7 THEN 'A'
                WHEN cum_rev / total_rev <= 0.9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """
    hits = order_free_partition_aggs(pre_fix)
    assert ("SUM", "revenue") in hits, hits
    # and the ORDER-pinned running sum is NOT flagged
    assert all(arg != "revenue" or fn != "AVG" for fn, arg in hits)
    assert len(hits) == 1
    # the flagged shape carries no allowlist entry — a re-registration
    # of the pre-fix SQL would fail the registry-wide test above
    assert ("agg_pareto_abc", "SUM", "revenue") not in ALLOWLIST


def test_lint_ignores_comments_and_pinned_folds():
    sql = """
    -- an order-free SUM() OVER (PARTITION BY) in prose must not match
    SELECT SUM(x) OVER (PARTITION BY g ORDER BY ts) AS running,
           MAX(x) OVER (PARTITION BY g) AS mx,
           COUNT(*) OVER (PARTITION BY g) AS cnt
    FROM t
    """
    assert order_free_partition_aggs(sql) == []


def test_lint_sees_past_dashes_inside_string_literals():
    """r14 ADVICE item 3: a '--' INSIDE a single-quoted literal is data,
    not a comment — the rest of that line must still be scanned (and a
    real trailing comment must still be stripped)."""
    sql = """
    SELECT SUM(revenue) OVER (PARTITION BY n) AS t
    FROM x WHERE sep = '--'  -- SUM(bogus) OVER (PARTITION BY prose)
    """
    assert order_free_partition_aggs(sql) == [("SUM", "revenue")]
    # the hazardous shape AFTER the literal on the same line is seen
    sql2 = "SELECT 1 FROM x WHERE sep = '--' AND 0 < SUM(r) OVER (PARTITION BY g)"
    assert order_free_partition_aggs(sql2) == [("SUM", "r")]


def test_lint_sees_filter_clauses_and_named_windows():
    """The shapes that could smuggle the flake class past a naive scanner
    (r14 review finding): an aggregate FILTER clause between the fold and
    OVER, and a named WINDOW reference."""
    filtered = """
    SELECT SUM(revenue) FILTER (WHERE region = 'EU')
             OVER (PARTITION BY n_name) AS t
    FROM part_revenue
    """
    assert order_free_partition_aggs(filtered) == [("SUM", "revenue")]

    named = """
    SELECT SUM(revenue) OVER w AS t,
           AVG(price) OVER w2 AS a
    FROM part_revenue
    WINDOW w AS (PARTITION BY n_name),
           w2 AS (PARTITION BY n_name ORDER BY price)
    """
    assert order_free_partition_aggs(named) == [("SUM", "revenue")]


# ---------------------------------------------------------------------------
# The boundary-collision sibling of the window-fold class (r15, third live
# catch of the order-sensitivity family): a GROUP-BY SUM over addends that
# are themselves ROUND(..., j)-QUANTIZED, re-rounded to a coarser k < j,
# puts the EXACT sum on a k-digit rounding half-boundary with probability
# ~10^-(j-k)/2 per group — and once group sums are large enough that one
# double ulp exceeds the 1e-9 nudge (>= ~5e6), the float fold's arrival-
# order wobble decides the boundary side run-to-run. agg_pareto_abc's
# class_revenue hit it at sf0.01 (NATION_13/B exact sum 11572169.1050,
# caught as a 1-in-2-sweeps hash mismatch, confirmed by exact-decimal
# audit — SCALE.md r15); the fix is an exact DECIMAL(38,j) fold before
# the coarser round. This lint pins the shape out of every oracle.

def requantized_group_sums(sql: str) -> list[tuple[str, int, int]]:
    """(col, j, k) for every ROUND(SUM(col), k) over a col defined as
    ROUND(... + 1e-9, j) with j > k — the exact-boundary-collision shape.
    A SUM over CAST(col AS DECIMAL(38,j)) does not match: that is the
    sanctioned exact-fold fix. Paren-matching scanner (the addend
    definitions nest arbitrarily: ROUND(SUM(x * (1 - d)) + 1e-9, 4)).

    SCANNER LIMITS (stated like the builder-side lint's, r15 advice
    item 4): round scales parse as any digit run; the summed column may
    be alias-qualified (t.col — matched on the bare name, since the
    addend's AS alias is necessarily unqualified); the half-even nudge
    must be spelled literally ``+ 1e-9`` — that is this repo's single
    house spelling (grep-enforced by the oracles' shared style; an eps
    hoisted into a named constant would be a new spelling introduced
    AFTER this lint, i.e. a reviewable choice, not silent drift)."""
    s = _strip_sql_comments(sql)
    defs: dict[str, int] = {}
    for m in re.finditer(r"\bROUND\s*\(", s, re.I):
        j = _match_parens(s, m.end() - 1)
        inner = s[m.end():j]
        mq = re.search(r"\+\s*1e-9\s*,\s*(\d+)\s*$", inner)
        ma = re.match(r"\s*AS\s+(\w+)", s[j + 1:], re.I)
        if mq and ma:
            defs[ma.group(1)] = int(mq.group(1))
    return [
        (col, defs[col], int(k))
        for name, k in re.findall(
            r"ROUND\(SUM\((\w+(?:\.\w+)?)\)\s*(?:\+\s*1e-9)?\s*,\s*(\d+)\)",
            s, re.I)
        for col in [name.split(".")[-1]]
        if col in defs and defs[col] > int(k)
    ]


def test_no_requantized_float_group_sums_in_registry():
    from dumpr_spark.queries.base import oracle_sql

    flagged = {
        (name, *hit)
        for name, sql in oracle_sql().items()
        for hit in requantized_group_sums(sql)
    }
    assert not flagged, (
        "float SUM over finer-quantized rounded addends, re-rounded "
        f"coarser (the agg_pareto_abc boundary-collision class): {sorted(flagged)} "
        "— fold exactly via SUM(CAST(col AS DECIMAL(38, j))) before the "
        "coarser ROUND (see agg_pareto_abc's class_revenue), or justify "
        "why the group sums stay small enough (< ~5e6) that the 1e-9 "
        "nudge dominates a double ulp"
    )


def test_requantize_lint_catches_the_prefix_pareto_output():
    """Seeded regression: the pre-r15 pareto output aggregate — a float
    SUM over 4dp-rounded revenue re-rounded to 2dp — must be flagged;
    the shipped decimal-exact form must NOT."""
    pre_fix = """
    WITH rev AS (
      SELECT n_name, ROUND(SUM(x * (1 - d)) + 1e-9, 4) AS revenue
      FROM t GROUP BY n_name
    )
    SELECT n_name, ROUND(SUM(revenue) + 1e-9, 2) AS class_revenue
    FROM rev GROUP BY n_name
    """
    assert requantized_group_sums(pre_fix) == [("revenue", 4, 2)]

    fixed = pre_fix.replace(
        "ROUND(SUM(revenue) + 1e-9, 2)",
        "CAST(ROUND(SUM(CAST(revenue AS DECIMAL(38,4))), 2) AS DOUBLE)",
    )
    assert requantized_group_sums(fixed) == []
    # same-precision re-rounding is safe (2dp sums cannot sit on a 2dp
    # half-boundary) and must not be flagged
    same = pre_fix.replace(", 4) AS revenue", ", 2) AS revenue")
    assert requantized_group_sums(same) == []


def test_requantize_lint_matches_broadened_spellings():
    """r15 advice item 4: scale >= 10 and alias-qualified summed columns
    must not escape the scanner."""
    wide_scale = """
    WITH rev AS (
      SELECT g, ROUND(SUM(x) + 1e-9, 10) AS revenue FROM t GROUP BY g
    )
    SELECT g, ROUND(SUM(revenue) + 1e-9, 2) AS cr FROM rev GROUP BY g
    """
    assert requantized_group_sums(wide_scale) == [("revenue", 10, 2)]

    qualified = """
    WITH rev AS (
      SELECT g, ROUND(SUM(x) + 1e-9, 4) AS revenue FROM t GROUP BY g
    )
    SELECT r.g, ROUND(SUM(r.revenue) + 1e-9, 2) AS cr
    FROM rev r GROUP BY r.g
    """
    assert requantized_group_sums(qualified) == [("revenue", 4, 2)]
