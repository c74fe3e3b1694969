"""Fuzzy (edit-distance <= 1) equi-joinable string matching.

A naive fuzzy join is a cross join with a per-pair edit-distance check —
O(n x m) comparisons, unrunnable once neither side broadcasts. The FastSS /
SymSpell reduction makes it an EQUI-join: two strings are within edit
distance 1 only if their deletion neighborhoods (the string itself plus
every single-character deletion) intersect, so

1. explode each side into its <= len+1 neighborhood variants (narrow, x~len
   row multiplication — same pre-fanout discipline as shingling),
2. equi-join on the variant (hash shuffle, AQE-skewable),
3. verify candidates with a real `levenshtein <= 1` check (the neighborhood
   test admits some distance-2 pairs — deletions at different positions —
   so verification is NOT optional).

Cost: O((n+m) * len) shuffled variant rows + candidate verification,
instead of O(n * m) comparisons. The same ladder extends to distance k with
k-deletion neighborhoods (size ~len^k) — distance 1 is the common
normalization/key-reconciliation case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def deletion_variants(col: str) -> Column:
    """ARRAY<STRING>: the string plus every single-character deletion."""
    return F.expr(
        f"array_union(array({col}), "
        f"transform(sequence(1, greatest(length({col}), 1)), "
        f"i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1))))"
    )


def edit1_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
) -> DataFrame:
    """All (left, right) row pairs whose strings are within edit distance 1.
    Returns the full columns of both inputs (names must not collide).

    Set semantics: a pair of ROWS appears once even if the two strings
    share several neighborhood variants — which also means duplicate input
    rows collapse. Callers needing multiset semantics must carry a
    row-unique id column (it keys the dedup like any other column)."""
    lv = left.withColumn("_var", F.explode(deletion_variants(left_col)))
    rv = right.withColumn("_var", F.explode(deletion_variants(right_col)))
    return (
        lv.join(rv, "_var")
        .drop("_var")
        # verify BEFORE the dedup shuffle: distance-2 candidates admitted by
        # the neighborhood test never reach the distinct
        .where(F.levenshtein(F.col(left_col), F.col(right_col)) <= 1)
        .distinct()
    )
