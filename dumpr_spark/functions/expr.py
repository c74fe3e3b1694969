"""Expression-level utilities shared across operators.

Catalyst has no let-expression, and three optimizer behaviors conspire to
re-evaluate an expensive subexpression many times per row if you rely on
helper columns (measured on the bloom probe, SCALE.md round-6: 15 md5
digests/row where one suffices, a 13x slowdown):

1. projection collapse inlines a single-reference alias into its consumer,
   including into higher-order-function lambda bodies (then evaluated once
   PER ELEMENT);
2. filter pushdown substitutes aliases into predicates with no cost model;
3. codegen common-subexpression elimination misses duplicated trees inside
   filter conditions and lambda bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def let(value: Column, body) -> Column:
    """Evaluate `value` ONCE per row and pass it to `body` as a lambda
    variable — Catalyst's missing let, built from a 1-element transform.
    Binding through a lambda boundary makes single evaluation STRUCTURAL:
    no optimizer rule substitutes through it, so the bound value is safe
    to reference any number of times (including inside nested lambdas)
    at zero extra cost. A NULL value binds as NULL and propagates."""
    return F.element_at(F.transform(F.array(value), body), 1)
