"""Builder-side companion to tests/test_orderfree_fold_lint.py (r14
verdict item 3: the oracle-text lint covers half the surface).

The oracle-side lint argues builder coverage via gate equivalence — a
builder-side order-free fold produces a value the oracle must match, so
the hazardous shape exists on both sides and the oracle scan sees it.
That argument held for both live catches (r7, r13), but it is
PROBABILISTIC for a semantic mismatch: a builder
``F.sum(x).over(Window.partitionBy(...))`` whose ORACLE pins the fold
with ORDER BY would only surface as the flake class itself (a last-ulp
difference flipping a hard decision at ~1e-3..1e-4 per sweep). This scan
closes that gap STRUCTURALLY: an AST walk over every ``dumpr_spark/``
source finds float-foldable aggregates (SUM/AVG and the variance class)
``.over()`` a window spec that has ``partitionBy`` and no ``orderBy`` —
the fold-order-free shape — resolving window specs bound to local names
(per-function scope) as well as inline chains. Every hit needs a written
justification below, same discipline as the oracle lint's allowlist and
test_plan_lint's BNLJ list.

Known scanner limits (stated, not silent): aggregates smuggled through
``F.expr("sum(x) over (partition by g)")`` strings are the ORACLE lint's
territory (the SQL text is scanned there, and the repo's builders use
the Column API for windows); Window specs built dynamically (loops,
helper returns) resolve only through simple name assignment. The repo
imports are uniform (``functions as F``, ``Window``), which the scanner
assumes — a new module deviating would surface in review, not silently
(the scan also matches bare ``sum(...)``/``avg(...)`` call names).
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "dumpr_spark")

FLOAT_FUNCS = {
    "sum", "avg", "mean", "stddev", "stddev_samp", "stddev_pop",
    "variance", "var_samp", "var_pop", "corr", "covar_samp", "covar_pop",
    "regr_slope", "regr_intercept", "regr_r2", "regr_avgx", "regr_avgy",
}

# (repo-relative file, agg func, summand source) -> why this order-free
# fold can never flip a downstream decision. Each entry mirrors the
# ORACLE-side justification for the same registered shape — delete the
# window or justify it, never blanket-allow.
ALLOWLIST: dict[tuple[str, str, str], str] = {
    ("dumpr_spark/functions/sketches.py", "sum", "F.sum('c')"): (
        "quantile_from_hist's per-group total: c is a merged per-bin "
        "COUNT (BIGINT) — integer addends, exact in any fold order, so "
        "the downstream `cum >= q * n` pick reads one deterministic "
        "total (oracle twin: the agg_quantile_mergeable entry)."
    ),
    ("dumpr_spark/functions/stats.py", "sum", "F.sum(weight_col)"): (
        "weighted_median's per-group total: the registered consumer "
        "(agg_weighted_median) weights by l_quantity — whole numbers "
        "stored as doubles, every addend and partial sum an exact "
        "integer far below 2^53, so the fold is exact in any order and "
        "the `cum >= total / 2.0` threshold reads one deterministic "
        "total (the oracle twin's justification verbatim); a future "
        "fractional-weight caller inherits the helper's docstring "
        "caveat, not a silent flake in a REGISTERED query."
    ),
    ("dumpr_spark/queries/streaming_batch.py", "sum", "F.sum('n')"): (
        "events_markov_transitions' row normalizer: n is a per-(prev, "
        "next) transition COUNT(*) — integer addends, exact in any fold "
        "order (oracle twin: the events_markov_transitions entry)."
    ),
}


def _chain(node):
    """Method-call names along a call/attribute chain, plus its base."""
    names, cur = [], node
    while True:
        if isinstance(cur, ast.Call) and isinstance(cur.func, ast.Attribute):
            names.append(cur.func.attr)
            cur = cur.func.value
        elif isinstance(cur, ast.Attribute):
            names.append(cur.attr)
            cur = cur.value
        else:
            return names, cur


def _window_info(node, env):
    """(is_window_spec, has_partitionBy, has_orderBy) for an expression —
    a Window.* chain, a further-chained name bound to one, or the name
    itself."""
    if isinstance(node, ast.Name):
        return env.get(node.id, (False, False, False))
    names, base = _chain(node)
    if isinstance(base, ast.Name) and base.id == "Window":
        return (True, "partitionBy" in names, "orderBy" in names)
    if isinstance(base, ast.Name) and base.id in env:
        w = env[base.id]
        return (w[0], w[1] or "partitionBy" in names,
                w[2] or "orderBy" in names)
    return (False, False, False)


def _agg_name(node):
    """The aggregate's function name for <agg>.over(w), if <agg> is an
    F.<fn>(...) or bare <fn>(...) call."""
    if isinstance(node, ast.Call):
        f = node.func
        if (isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name)
                and f.value.id == "F"):
            return f.attr
        if isinstance(f, ast.Name):
            return f.id
    return None


def order_free_builder_folds(src: str) -> list[tuple[int, str, str]]:
    """All (lineno, func, agg_source) hits in `src`: a float-foldable
    aggregate .over() a partitionBy-without-orderBy window spec, with
    name-bound specs resolved per function scope."""
    tree = ast.parse(src)
    hits: list[tuple[int, str, str]] = []

    class Scan(ast.NodeVisitor):
        def __init__(self, env):
            self.env = env

        def visit_FunctionDef(self, node):
            inner = Scan(dict(self.env))
            for stmt in node.body:
                inner.visit(stmt)

        visit_AsyncFunctionDef = visit_FunctionDef

        def visit_Assign(self, node):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    self.env[t.id] = _window_info(node.value, self.env)
            self.generic_visit(node)

        def visit_Call(self, node):
            if (isinstance(node.func, ast.Attribute)
                    and node.func.attr == "over" and node.args):
                fn = _agg_name(node.func.value)
                if fn and fn.lower() in FLOAT_FUNCS:
                    is_w, has_p, has_o = _window_info(node.args[0], self.env)
                    if is_w and has_p and not has_o:
                        hits.append((node.lineno, fn,
                                     ast.unparse(node.func.value)))
            self.generic_visit(node)

    scanner = Scan({})
    for stmt in tree.body:
        scanner.visit(stmt)
    return hits


def test_builder_order_free_window_folds_all_justified():
    flagged = set()
    for dirpath, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, REPO)
            for _lineno, fn, agg_src in order_free_builder_folds(
                    open(p).read()):
                flagged.add((rel, fn, agg_src))
    unjustified = flagged - set(ALLOWLIST)
    assert not unjustified, (
        "builder-side order-free float window fold(s) without a written "
        f"justification (the agg_pareto_abc flake class): "
        f"{sorted(unjustified)} — pin the fold with orderBy and read the "
        "last running value, or add an ALLOWLIST entry in "
        "tests/test_builder_fold_lint.py explaining why this fold can "
        "never flip a downstream decision"
    )
    stale = set(ALLOWLIST) - flagged
    assert not stale, (
        f"stale ALLOWLIST entries (shape no longer in the source): "
        f"{sorted(stale)} — delete them so the allowlist stays a live claim"
    )


def test_builder_lint_catches_the_prefix_pareto_shape():
    """Seeded regression: the pre-fix pareto shape expressed in the
    Column API — an order-free float partition total next to the
    ORDER-pinned running sum — is flagged (and only it), through BOTH
    spelling paths: a name-bound spec and an inline chain."""
    named = """
w_run = Window.partitionBy("n_name").orderBy(F.desc("revenue"), "l_partkey")
w_tot = Window.partitionBy("n_name")
out = ranked.select(
    F.sum("revenue").over(w_run).alias("cum_rev"),
    F.sum("revenue").over(w_tot).alias("total_rev"),
    F.count(F.lit(1)).over(w_tot).alias("n_parts"),
)
"""
    hits = order_free_builder_folds(named)
    assert [(fn, src) for _ln, fn, src in hits] == [("sum", "F.sum('revenue')")]

    inline = """
out = ranked.withColumn(
    "total_rev", F.sum("revenue").over(Window.partitionBy("n_name"))
).withColumn(
    "cum_rev",
    F.sum("revenue").over(
        Window.partitionBy("n_name").orderBy("revenue")),
)
"""
    hits = order_free_builder_folds(inline)
    assert [(fn, src) for _ln, fn, src in hits] == [("sum", "F.sum('revenue')")]


def test_builder_lint_resolves_rebound_and_extended_specs():
    """A spec EXTENDED from a name keeps/gains its orderBy correctly: a
    frame clause on an unordered base stays flagged; rebinding with
    orderBy clears it. The variance class is covered too."""
    extended = """
base = Window.partitionBy("g")
framed = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
pinned = base.orderBy("ts")
out = df.select(
    F.avg("x").over(framed).alias("a"),     # unordered: flagged
    F.stddev("x").over(base).alias("s"),    # unordered: flagged
    F.sum("x").over(pinned).alias("run"),   # order-pinned: clean
    F.max("x").over(base).alias("m"),       # order-insensitive: clean
)
"""
    hits = order_free_builder_folds(extended)
    assert {(fn, src) for _ln, fn, src in hits} == {
        ("avg", "F.avg('x')"), ("stddev", "F.stddev('x')"),
    }
