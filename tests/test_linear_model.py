"""Tests for the distributed logistic-regression quality classifier
(operators.linear_model): the gradient math is differential-tested
against a numpy replica of the exact same spec, convergence is gated on
separable data, and serving is pure map-side codegen."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sap_data_pipeline_spark.operators.linear_model import (
    logreg_score,
    logreg_train,
)


def _separable(spark, n=400):
    """Deterministic near-separable 2-feature data: y = (x1 + x2 > n)."""
    return spark.range(n).select(
        F.col("id").alias("x1"),
        ((F.col("id") * 7919) % n).alias("x2"),
        ((F.col("id") + (F.col("id") * 7919) % n) > n).cast("int").alias("y"),
    )


def _numpy_replica(X, y, iterations, lr):
    """The exact spec of logreg_train: standardize (population std),
    zero init, full-batch mean gradient, unfold to raw scale."""
    mu, sd = X.mean(axis=0), np.maximum(X.std(axis=0), 1e-12)
    Xs = (X - mu) / sd
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        err = p - y
        w = w - lr * (Xs * err[:, None]).mean(axis=0)
        b = b - lr * err.mean()
    return w / sd, b - float((w * mu / sd).sum())


def test_logreg_matches_numpy_replica(spark):
    df = _separable(spark, 300)
    model = logreg_train(df, ["x1", "x2"], "y", iterations=10, lr=0.7)
    pdf = df.toPandas()
    X = pdf[["x1", "x2"]].to_numpy(dtype=float)
    w_np, b_np = _numpy_replica(X, pdf["y"].to_numpy(dtype=float), 10, 0.7)
    w_sp = [model["weights"]["x1"], model["weights"]["x2"]]
    # Spark's avg combines partials in scheduler order — identical math,
    # float-summation-order tolerance only
    assert w_sp == pytest.approx(list(w_np), rel=1e-6)
    assert model["intercept"] == pytest.approx(b_np, rel=1e-6)


def test_logreg_converges_on_separable_data(spark):
    df = _separable(spark)
    model = logreg_train(df, ["x1", "x2"], "y", iterations=40, lr=1.0)
    scored = logreg_score(df, model)
    acc = scored.select(
        F.avg((F.col("pred") == (F.col("y") == 1)).cast("double"))
    ).first()[0]
    assert acc > 0.97, acc
    # the separating direction is learned: both weights positive
    assert model["weights"]["x1"] > 0 and model["weights"]["x2"] > 0


def test_logreg_deterministic_retrain(spark):
    df = _separable(spark, 200)
    m1 = logreg_train(df, ["x1", "x2"], "y", iterations=8, lr=0.5)
    m2 = logreg_train(df, ["x1", "x2"], "y", iterations=8, lr=0.5)
    for c in ("x1", "x2"):
        assert m1["weights"][c] == pytest.approx(m2["weights"][c], rel=1e-9)
    assert m1["intercept"] == pytest.approx(m2["intercept"], rel=1e-9)


def test_logreg_constant_feature_gets_zero_weight(spark):
    df = _separable(spark, 200).withColumn("const", F.lit(5))
    model = logreg_train(df, ["x1", "x2", "const"], "y", iterations=8, lr=0.5)
    # a zero-variance feature carries no gradient — weight stays 0
    # instead of blowing up on the 1/std
    assert model["weights"]["const"] == 0.0


def test_logreg_score_is_map_side_only(spark):
    df = _separable(spark, 100)
    model = {"weights": {"x1": 0.5, "x2": -0.25}, "intercept": 1.0}
    out = logreg_score(df, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    row = out.filter(F.col("id") == 10).first()
    z = 1.0 + 0.5 * row["x1"] - 0.25 * row["x2"]
    assert row["logit"] == pytest.approx(round(z, 6))
    assert row["score"] == pytest.approx(round(1 / (1 + math.exp(-row["logit"])), 6))
    assert row["pred"] == (row["logit"] > 0)


def test_logreg_rejects_bad_inputs(spark):
    df = _separable(spark, 50)
    with pytest.raises(ValueError):
        logreg_train(df, [], "y")
    with pytest.raises(ValueError):
        logreg_train(df, ["x1"], "y", iterations=0)
