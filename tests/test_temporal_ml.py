"""Semantics of the round-2 coverage operators: as-of join, winnowing
fingerprints, embedding near-dup pairs, MLlib RF lane, approx
distinct error bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from patientdataintegration_spark.operators.temporal import asof_join


def _streams(spark):
    # left: observations; right: quotes. user 1 has quotes at t=10,20;
    # user 2 has one quote after all observations (never matched).
    left = spark.createDataFrame(
        [(1, 15, "a"), (1, 20, "b"), (1, 25, "c"), (2, 5, "d"), (3, 9, "e")],
        "user_id long, t long, tag string",
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 50, 500.0)],
        "user_id long, t long, value double",
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "value")
    return left, right


def test_asof_join_backward_inner(spark):
    left, right = _streams(spark)
    out = asof_join(left, right, on=["user_id"], payload=["value"], how="inner")
    got = {r["tag"]: r["asof_value"] for r in out.collect()}
    # t=15 -> quote@10; t=20 -> quote@20 (equality matches); t=25 -> quote@20
    assert got == {"a": 100.0, "b": 200.0, "c": 200.0}


def test_asof_join_left_keeps_unmatched(spark):
    left, right = _streams(spark)
    out = asof_join(left, right, on=["user_id"], payload=["value"], how="left")
    got = {r["tag"]: r["asof_value"] for r in out.collect()}
    assert got["d"] is None and got["e"] is None  # no prior quote
    assert len(got) == 5


def test_winnowing_guarantee(spark):
    """Docs sharing a run of >= k+w-1 tokens must share a fingerprint;
    a disjoint doc must not."""
    from patientdataintegration_spark.operators.textops import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens >= 3+4-1
    d = spark.createDataFrame(
        [
            (0, f"start one two {shared} end"),
            (1, f"other prefix {shared} different suffix words"),
            (2, "completely unrelated text with no overlap at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(d, k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared run must produce a shared fingerprint"
    assert not (by_doc[0] & by_doc[2])
    # short docs: < k tokens -> no rows; >= k tokens but < w grams -> 1 fp
    short = spark.createDataFrame(
        [(10, "just two"), (11, "exactly three tokens here")],
        "doc_id long, text string",
    )
    short_fps = winnow_fingerprints(short, k=3, w=4).groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in short_fps}
    assert 10 not in counts
    assert counts[11] == 1


def test_neardup_pairs_threshold_and_blocking(spark):
    from patientdataintegration_spark.operators.similarity import neardup_pairs

    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),   # near-dup of 0 (same block)
        (2, [0.0, 1.0, 0.0], 0),   # orthogonal to 0
        (3, [1.0, 0.0, 0.0], 1),   # identical to 0 but other block: unseen
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r["vec_a"], r["vec_b"]): r["cos_sim"] for r in neardup_pairs(
        e, block_col="label", threshold=0.5
    ).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert (0, 2) not in pairs
    assert (0, 3) not in pairs  # cross-block pair is by-design out of scope


def test_random_forest_better_than_chance(spark, sf_dir):
    from patientdataintegration_spark.operators.mlbridge import random_forest_scores

    scored = random_forest_scores(spark, sf_dir)
    agg = scored.agg(
        F.avg((F.col("label") == F.col("pred")).cast("double")).alias("acc"),
        F.min("score").alias("lo"),
        F.max("score").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg["n"] > 0
    assert agg["acc"] > 0.55, f"RF should beat chance, got {agg['acc']}"
    assert 0.0 <= agg["lo"] <= agg["hi"] <= 1.0


def test_approx_distinct_error_bound(spark, sf_dir):
    """Live HLL estimate within 5% of exact (the raw estimate no
    longer reaches q95's output — its oracle pins the verdict — so
    recompute it here for the tighter live assertion)."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext import q95_approx_distinct

    e = load_table(spark, sf_dir, "events")
    raw = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    ).collect()
    assert raw
    for r in raw:
        rel = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert rel < 0.05, f"{r['event_type']}: rel err {rel}"
    assert all(r.within_5pct for r in q95_approx_distinct(spark, sf_dir).collect())


def test_sliding_windows_cover_tumbling(spark, sf_dir):
    """Every 300s tumbling bucket appears among the 600s sliding
    window starts, and sliding counts sum to exactly 2x event count."""
    from patientdataintegration_spark.suite.ext import (
        q37_events_tumbling,
        q39_events_sliding,
    )

    tumb = q37_events_tumbling(spark, sf_dir)
    slide = q39_events_sliding(spark, sf_dir)
    n_events = tumb.agg(F.sum("n")).collect()[0][0]
    n_slide = slide.agg(F.sum("n")).collect()[0][0]
    assert n_slide == 2 * n_events
    missing = (
        tumb.select("bucket").distinct()
        .join(slide.select("bucket").distinct(), "bucket", "left_anti")
        .count()
    )
    assert missing == 0


def test_random_forest_model_artifact_roundtrip(spark, sf_dir, tmp_path):
    """K2 (binary artifact sink/load, reference torch.save of the
    best model, functions_v2.py:382-387): MLlib model write +
    read-back produces identical predictions."""
    from pyspark.ml.classification import RandomForestClassificationModel
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    from patientdataintegration_spark.sources.catalog import load_table

    import pyspark.sql.functions as F

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", (F.col("c_acctbal") > 0).cast("int").alias("label")
    )
    feats = VectorAssembler(
        inputCols=["c_nationkey"], outputCol="features"
    ).transform(c)
    model = RandomForestClassifier(
        numTrees=11, maxDepth=3, seed=1, labelCol="label"
    ).fit(feats)
    path = str(tmp_path / "rf_model")
    model.write().overwrite().save(path)
    back = RandomForestClassificationModel.load(path)
    a = model.transform(feats).select("c_custkey", "prediction")
    b = back.transform(feats).select("c_custkey", "prediction")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_count_parameters_rf_and_linear(spark):
    """M6 parameter counting: tree ensembles report node totals,
    linear models coefficient+intercept counts."""
    from pyspark.ml.classification import LogisticRegression, RandomForestClassifier
    from pyspark.ml.linalg import Vectors

    from patientdataintegration_spark.operators.mlbridge import count_parameters

    df = spark.createDataFrame(
        [(Vectors.dense([float(i), float(i % 3)]), i % 2) for i in range(40)],
        ["features", "label"],
    )
    rf = RandomForestClassifier(numTrees=3, maxDepth=2, seed=7).fit(df)
    got = count_parameters(rf)
    assert got["n_trees"] == 3
    assert got["total_nodes"] >= 3  # at least a root per tree
    assert got["n_parameters"] == got["total_nodes"]
    assert 0 <= got["max_tree_depth"] <= 2

    lr = LogisticRegression(maxIter=5).fit(df)
    got = count_parameters(lr)
    assert got["n_coefficients"] == 2
    assert got["n_parameters"] == 3  # 2 coefficients + intercept
