"""Grouped score aggregation — the reference's core analytic
(SURVEY.md §2.5 A5/A7/A8, §2.3 F3; reference `calculate_slide_acc`,
`functions_v2.py:515-563`).

The reference loops Python-side over `np.unique(slide_id_list)` and
means each slide's tile scores (`functions_v2.py:520-524`): an O(
slides × tiles) nested scan. Spark-first this is ONE hash aggregate
with map-side partial aggregation — `groupBy(group).agg(avg(score),
first(label))` — the textbook set-oriented rewrite called out in
SURVEY.md §3.3. The label join-back (J6: "slide label = label of its
first tile") is `first(label)` inside the same agg, valid because
the label is functionally dependent on the group key; no second join.

`group_scores` is the flagship building block: tile/item-level
scores in, group-level (score, label, pred) out, ready for
balanced-accuracy / AUROC / fusion downstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from patientdataintegration_spark.functions.scalars import threshold_pred


def group_scores(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str = "score",
    label_col: str = "label",
    threshold: float = 0.5,
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group mean score + carried label + thresholded prediction.

    One shuffle on `group_cols`; partial aggregation halves the
    shuffle volume at scale. `label_col` and `carry_cols` must be
    functionally dependent on the group key (the reference's "slide
    label = label of its tiles", J6); they are carried as EXTRA GROUP
    KEYS rather than first()/min() aggregates — same result, same
    group cardinality, but the aggregation stays a pure
    HashAggregate (first() is order-sensitive and min(string) has no
    mutable buffer, either would force a SortAggregate).
    """
    aggs = [
        F.avg(score_col).alias("group_score"),
        F.count(F.lit(1)).alias("n_items"),
    ]
    out = df.groupBy(*group_cols, label_col, *carry_cols).agg(*aggs)
    return out.withColumn("pred", threshold_pred(F.col("group_score"), threshold))
