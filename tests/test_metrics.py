"""Golden-number tests for the metric aggregations (SURVEY.md §5.2):
hand-computed sklearn-equivalent values on tiny fixtures."""

from __future__ import annotations

import pytest

from patientdataintegration_spark.functions.metrics import (
    auroc,
    balanced_accuracy,
    mean_std_over,
)


def test_balanced_accuracy_matches_macro_recall(spark):
    # labels: 0,0,0,1,1 ; preds: 0,1,0,1,0
    # recall_0 = 2/3, recall_1 = 1/2 -> BA = (2/3 + 1/2)/2 = 7/12
    rows = [(0, 0), (0, 1), (0, 0), (1, 1), (1, 0)]
    df = spark.createDataFrame(rows, "label int, pred int")
    got = balanced_accuracy(df).collect()[0]["bal_acc"]
    assert got == pytest.approx(7 / 12, abs=1e-12)


def test_balanced_accuracy_grouped(spark):
    rows = [("a", 0, 0), ("a", 1, 1), ("b", 0, 1), ("b", 1, 1)]
    df = spark.createDataFrame(rows, "g string, label int, pred int")
    got = {r["g"]: r["bal_acc"] for r in balanced_accuracy(df, group_cols=["g"]).collect()}
    assert got["a"] == pytest.approx(1.0)
    assert got["b"] == pytest.approx(0.5)


def test_auroc_perfect_and_random(spark):
    # perfectly separable -> AUC 1.0
    rows = [(0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9)]
    df = spark.createDataFrame(rows, "label int, score double")
    assert auroc(df).collect()[0]["auroc"] == pytest.approx(1.0)
    # fully anti-separable -> 0.0
    rows = [(1, 0.1), (1, 0.2), (0, 0.8), (0, 0.9)]
    df = spark.createDataFrame(rows, "label int, score double")
    assert auroc(df).collect()[0]["auroc"] == pytest.approx(0.0)


def test_auroc_tie_handling_matches_sklearn(spark):
    # sklearn roc_auc_score([0,1,0,1], [0.5,0.5,0.2,0.8]) = 0.875
    # (tie between a pos and a neg contributes 0.5)
    rows = [(0, 0.5), (1, 0.5), (0, 0.2), (1, 0.8)]
    df = spark.createDataFrame(rows, "label int, score double")
    assert auroc(df).collect()[0]["auroc"] == pytest.approx(0.875)


def test_auroc_is_partitioning_invariant(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randint(0, 1), round(rng.random(), 3)) for _ in range(500)]
    df1 = spark.createDataFrame(rows, "label int, score double")
    df2 = df1.repartition(13)
    a1 = auroc(df1).collect()[0]["auroc"]
    a2 = auroc(df2).collect()[0]["auroc"]
    assert a1 == a2  # bit-exact, not approx: rank sums are exact


def test_mean_std_population_semantics(spark):
    # np.std([1,2,3,4], ddof=0) = sqrt(1.25)
    df = spark.createDataFrame([(float(x),) for x in [1, 2, 3, 4]], "v double")
    row = mean_std_over(df, "v").collect()[0]
    assert row["mean_v"] == pytest.approx(2.5)
    assert row["std_v"] == pytest.approx(1.25**0.5, abs=1e-6)
