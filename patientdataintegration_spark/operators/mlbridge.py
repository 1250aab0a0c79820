"""MLlib bridge — the reference's sklearn/torch surface re-expressed
on `pyspark.ml` (SURVEY.md §2.11).

M1 (random forest on tabular patient features, `ipynb cell
10:37-48`: RandomForestClassifier(n_estimators=121, max_depth=5))
maps to `pyspark.ml.classification.RandomForestClassifier` over a
`VectorAssembler` feature column. Training happens distributed;
scoring is a plan-native transform. Tree ensembles are not
bit-reproducible across libraries, so this lane is rows-only checked
(driver contract) and pytest asserts invariants (probability range,
better-than-chance accuracy on a separable label) instead of exact
values — the same stance SURVEY.md §5.2 takes for W1 sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from patientdataintegration_spark.sources.catalog import load_table


def strip_training_summary(model):
    """Drop a fitted model's `trainingSummary` before using it for
    scoring. The summary holds a SparkSession reference; when the
    model ships to executors inside the prediction ScalaUDF's closure,
    Java serialization walks into the session — and fails with
    `NotSerializableException: ObservationManager` on any session
    whose (non-transient) observationManager lazy val has been
    initialized by a `Dataset.observe(Observation, ...)` call
    (PySpark 4.1 classic; see `plans/observability.py`). Stripping the
    summary also keeps the task closure small — the summary's metric
    frames have no business on executors. No-op when the model has no
    summary or the py4j internals differ (Connect)."""
    try:
        if getattr(model, "hasSummary", False):
            jvm = SparkSession.getActiveSession()._jvm
            model._java_obj.setSummary(jvm.scala.Option.empty())
    except Exception:
        pass
    return model


def random_forest_scores(
    spark: SparkSession,
    sf_dir: str,
    num_trees: int = 121,
    max_depth: int = 5,
    seed: int = 1,
) -> DataFrame:
    """Train an RF on customer tabular features and score the same
    relation (the reference's RF trains/scores the slide-metadata
    table in-memory the same way).

    Label: account balance above the global mean — a deterministic,
    separable target derived only from the data. Features exclude
    the balance itself (nation key, market segment index, name
    digits) so the task is non-trivial.
    """
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import StringIndexer, VectorAssembler

    c = load_table(spark, sf_dir, "customer")
    mean_bal = c.agg(F.avg("c_acctbal").alias("m"))
    base = c.crossJoin(F.broadcast(mean_bal)).select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.regexp_extract("c_name", r"(\d+)$", 1).cast("double").alias("name_num"),
        (F.col("c_acctbal") > F.col("m")).cast("int").alias("label"),
    )
    seg_idx = StringIndexer(
        inputCol="c_mktsegment", outputCol="seg_idx", stringOrderType="alphabetAsc"
    )
    assembler = VectorAssembler(
        inputCols=["c_nationkey", "seg_idx", "name_num"], outputCol="features"
    )
    rf = RandomForestClassifier(
        numTrees=num_trees,
        maxDepth=max_depth,
        seed=seed,
        labelCol="label",
        featuresCol="features",
    )
    indexed = seg_idx.fit(base).transform(base)
    feats = assembler.transform(indexed)
    model = strip_training_summary(rf.fit(feats))
    scored = model.transform(feats)
    from pyspark.ml.functions import vector_to_array

    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        "c_custkey",
        "label",
        F.col("prediction").cast("int").alias("pred"),
        F.round(p1, 6).alias("score"),
    )


def count_parameters(model) -> dict[str, int]:
    """M6 (`ExperimentSetup_v2.py:192-193,234-235` counts torch model
    parameters): the MLlib analogue — model size accounting for
    tree ensembles and linear models, the number a training pipeline
    logs next to its metrics.

    For tree ensembles every internal node carries (feature index,
    threshold) and every leaf a prediction — `total_nodes` is the
    parameter-bearing unit count; linear models report coefficient +
    intercept counts. Returns a plain dict so callers can log or
    union it into a results overview.
    """
    out: dict[str, int] = {}
    if hasattr(model, "totalNumNodes"):
        out["n_trees"] = int(model.getNumTrees)
        out["total_nodes"] = int(model.totalNumNodes)
        depths = [t.depth for t in model.trees]
        out["max_tree_depth"] = int(max(depths)) if depths else 0
        out["n_parameters"] = int(model.totalNumNodes)
    elif hasattr(model, "coefficients"):
        n_coef = len(model.coefficients)
        out["n_coefficients"] = int(n_coef)
        out["n_parameters"] = int(n_coef) + (
            1 if hasattr(model, "intercept") else 0
        )
    else:
        raise TypeError(f"unsupported model type {type(model).__name__}")
    return out
