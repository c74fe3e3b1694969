"""Model-based quality scoring — the learned-filter stage of a curation
pipeline (heuristic signals -> linear model -> per-doc keep probability).

Two halves, split on purpose:

- **Scoring** (`score_quality`) is a pure column expression:
  sigmoid(w . features + b) over the engine's quality signals. Weights are
  plan-time constants, so scoring a 100 TB corpus is a narrow whole-stage-
  codegen projection — no shuffle, no Python, no model server. This is the
  production shape: training happens once on a sample, scoring is just
  arithmetic, and with FIXED weights the score is bit-reproducible in any
  engine (the DuckDB oracle recomputes it).
- **Training** (`train_quality_model`) fits a `pyspark.ml`
  LogisticRegression on a labeled sample and returns plain
  (weights, intercept) for the scoring path. Model objects never enter the
  data plan; only their coefficients do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dumpr_spark.functions import text as tx

# Feature extractors over a raw text column, in weight order. Scale-stable
# normalizations (per-doc ratios, not corpus stats) so scoring needs no
# second pass.
FEATURES = ("log_tokens", "mean_tok_len", "distinct_ratio", "stop_density")


def feature_columns(text_col: Column | str) -> dict[str, Column]:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = tx.token_count(c)
    stops = tx.stopword_count(c, "en").cast("double")
    return {
        "log_tokens": F.log(n.cast("double") + 1.0),
        "mean_tok_len": tx.mean_token_length(c),
        "distinct_ratio": tx.distinct_token_ratio(c),
        "stop_density": stops / n.cast("double"),
    }


def score_quality(
    text_col: Column | str, weights: dict[str, float], intercept: float
) -> Column:
    """sigmoid(w . f + b) as one JVM expression; unknown weight names raise."""
    feats = feature_columns(text_col)
    unknown = set(weights) - set(feats)
    if unknown:
        raise ValueError(f"unknown feature(s) {sorted(unknown)}; have {FEATURES}")
    z = F.lit(float(intercept))
    for name in FEATURES:
        if name in weights:
            z = z + F.lit(float(weights[name])) * feats[name]
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_quality_model(
    df: DataFrame, text_col: str = "text", label_col: str = "label"
) -> tuple[dict[str, float], float]:
    """Fit LogisticRegression on the standard features; returns
    ({feature: weight}, intercept) for `score_quality`. Run on a labeled
    SAMPLE (driver-side coefficients only — the fit itself is distributed)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = feature_columns(text_col)
    train = df.withColumns(feats).select(label_col, *FEATURES)
    assembled = VectorAssembler(
        inputCols=list(FEATURES), outputCol="features"
    ).transform(train)
    model = LogisticRegression(
        featuresCol="features", labelCol=label_col, regParam=0.01
    ).fit(assembled)
    w = {name: float(model.coefficients[i]) for i, name in enumerate(FEATURES)}
    return w, float(model.intercept)
