"""Distributed linear-model training and serving (quality classifier).

The modern curation stack filters documents with a cheap learned linear
classifier over text statistics (the CCNet / LLaMA "wiki-ref" style
quality filter, the fastText-as-feature-hasher lineage): train once on
a labelled slice, score the whole corpus at scan speed.  The reference
pipeline has no learned filter — extension surface, the same
train-once/serve-map-side split as the PCA / IVF / PQ families in
:mod:`operators.similarity`.

Scale shape (100 TB):

* **Training** (:func:`logreg_train`) is full-batch gradient descent
  where each iteration is ONE Spark aggregate: the gradient of the
  logistic loss is a mean over rows of ``(sigmoid(w·x) - y) · x``,
  so the per-iteration driver transfer is ``len(features) + 1``
  doubles — bounded by the feature count, never by the corpus (the
  PageRank budget class: a scalar-sized collect per round, fixed
  iteration count).  Features are standardized inside the expression
  (mean/std from one up-front aggregate) so one learning rate fits all
  scales; the returned weights are UNFOLDED back to raw-feature scale,
  making serving a pure raw-feature dot product.
* **Serving** (:func:`logreg_score`) is map-side column arithmetic —
  literal weights folded into one codegen'd expression, no shuffle, no
  Python, no model object to ship.

Determinism: weights init at zero, fixed ``iterations`` and ``lr``, no
sampling — retrains are bit-stable up to float summation order (the
aggregate's combine order; differential-tested against a numpy replica
of the same spec in tests/test_linear_model.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    iterations: int = 30,
    lr: float = 0.5,
    l2: float = 0.0,
) -> dict:
    """Full-batch logistic regression by gradient descent; returns
    ``{"weights": {col: w}, "intercept": b, "iterations": k, "lr": lr}``
    on RAW feature scale.

    One aggregate per iteration (gradient), one up front (moments);
    the input frame is consumed ``iterations + 1`` times, so callers
    training on an expensive upstream plan should ``.persist()`` it —
    the frame is scanned, never shuffled, by this operator.
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")

    # a NULL feature or label poisons every mean it touches (the
    # aggregates would come back None and crash opaquely) — train on
    # complete rows only, the standard trainer contract
    df = df.dropna(subset=[*feature_cols, label_col])

    # one moments pass: mean/std per feature (population std; +eps so a
    # constant column degrades to weight 0 instead of a division blowup)
    moments = df.agg(
        *[F.avg(F.col(c).cast("double")).alias(f"m_{i}")
          for i, c in enumerate(feature_cols)],
        *[F.stddev_pop(F.col(c).cast("double")).alias(f"s_{i}")
          for i, c in enumerate(feature_cols)],
    ).first()
    if moments[0] is None:  # no complete rows at all
        raise ValueError(
            "logreg_train needs at least one row with non-NULL "
            f"features + label (columns {[*feature_cols, label_col]})"
        )
    mu = [float(moments[f"m_{i}"]) for i in range(len(feature_cols))]
    sd = [max(float(moments[f"s_{i}"] or 0.0), 1e-12)
          for i in range(len(feature_cols))]

    xs = [
        ((F.col(c).cast("double") - F.lit(mu[i])) / F.lit(sd[i]))
        for i, c in enumerate(feature_cols)
    ]
    y = F.col(label_col).cast("double")

    w = [0.0] * len(feature_cols)
    b = 0.0
    for _ in range(iterations):
        z = F.lit(b)
        for j, x in enumerate(xs):
            z = z + F.lit(w[j]) * x
        err = _sigmoid(z) - y  # dL/dz per row
        grad = df.agg(
            *[F.avg(err * x).alias(f"g_{j}") for j, x in enumerate(xs)],
            F.avg(err).alias("g_b"),
        ).first()
        w = [
            w[j] - lr * (float(grad[f"g_{j}"]) + l2 * w[j])
            for j in range(len(w))
        ]
        b = b - lr * float(grad["g_b"])

    # unfold standardization: w_raw = w_std / sd; b_raw = b - Σ w_std·mu/sd
    w_raw = [w[j] / sd[j] for j in range(len(w))]
    b_raw = b - sum(w[j] * mu[j] / sd[j] for j in range(len(w)))
    return {
        "weights": dict(zip(feature_cols, w_raw)),
        "intercept": b_raw,
        "iterations": iterations,
        "lr": lr,
    }


def logreg_score(
    df: DataFrame,
    model: dict,
    *,
    logit_col: str = "logit",
    score_col: str = "score",
    pred_col: str = "pred",
    round_dp: int = 6,
) -> DataFrame:
    """Map-side scoring with a trained (or literal) model: appends the
    raw-feature ``logit`` (exact multiply/add arithmetic), the sigmoid
    ``score`` rounded to ``round_dp`` (the cross-engine float-boundary
    rule used by the TF-IDF/unigram oracles), and the boolean ``pred``
    (logit > 0).  Pure codegen — no shuffle, no Python, no UDF."""
    z: Column = F.lit(float(model["intercept"]))
    for c, wv in model["weights"].items():
        z = z + F.lit(float(wv)) * F.col(c).cast("double")
    return (
        df.withColumn(logit_col, F.round(z, round_dp))
        .withColumn(score_col, F.round(_sigmoid(F.col(logit_col)), round_dp))
        .withColumn(pred_col, F.col(logit_col) > 0)
    )
