"""Conditional fusion analytics — the paper's headline queries
(SURVEY.md §2.10; reference `naive_approach` ipynb cell 19:1-43 and
`threshold_determination` ipynb cell 15:10-116).

C1 naive fusion: per slide, if the CNN's confidence (score of its
predicted class) is <= threshold, defer to the patient-data RF
prediction, else keep the CNN prediction. The reference zips two
Python lists; here it is an equi-join on the group key (broadcast
when one side is dimension-sized) plus one `when` expression.

C2 threshold sweep: the reference re-loops the full scoring for each
threshold v in {0.6..1.0}. Spark-first: ONE cross join of the
(tiny, broadcast) threshold list against the slide-score relation,
then a single grouped aggregation per (threshold, ...) — the sweep
costs one pass over the data regardless of how many thresholds,
which is exactly the reshape you want at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from pyspark.sql import Column

from patientdataintegration_spark.functions.scalars import (
    oriented_score,
    pairwise_softmax,
    sigmoid,
)


def naive_fusion(
    cnn: DataFrame,
    rf: DataFrame,
    on: Sequence[str],
    threshold: float = 0.7,
    cnn_score: str = "cnn_score",
    cnn_pred: str = "cnn_pred",
    rf_pred: str = "rf_pred",
    broadcast_rf: bool = True,
) -> DataFrame:
    """C1 (`ipynb cell 19:27-33`): joined frame + fused prediction.

    When the RF side is dimension-sized relative to the facts,
    broadcast it so the join never shuffles the big side; pass
    ``broadcast_rf=False`` when both sides scale with the data (then
    it's a co-partitioned shuffle join on the group key).
    """
    rf_side = F.broadcast(rf) if broadcast_rf else rf
    joined = cnn.join(rf_side, on=list(on), how="inner")
    fused = F.when(F.col(cnn_score) <= F.lit(threshold), F.col(rf_pred)).otherwise(
        F.col(cnn_pred)
    )
    return joined.withColumn("fused_pred", fused)


def threshold_sweep(
    slide_scores: DataFrame,
    thresholds: Sequence[float],
    score_col: str = "score",
    sweep_col: str = "threshold",
) -> DataFrame:
    """C2 scaffold: tag every (threshold, slide) pair secure/unsecure
    in one broadcast cross join; downstream group-bys aggregate per
    threshold (`ipynb cell 15:46-54` partitions at each v)."""
    spark = slide_scores.sparkSession
    t_df = spark.createDataFrame([(float(t),) for t in thresholds], f"{sweep_col} double")
    tagged = slide_scores.crossJoin(F.broadcast(t_df))
    return tagged.withColumn(
        "is_secure", (F.col(score_col) > F.col(sweep_col)).cast("int")
    )


def orient_scores(df: DataFrame, score_col: str, pred_col: str, out_col: str = "pos_score") -> DataFrame:
    """C4: orient predicted-class probability to positive-class
    probability for AUROC (`ipynb cell 13:14`)."""
    return df.withColumn(out_col, oriented_score(F.col(score_col), F.col(pred_col)))


def weighted_fusion(
    prob_img: Column,
    imp_img: Column,
    prob_meta: Column,
    imp_meta: Column,
) -> Column:
    """C5 weighted fusion (`mymodels.py:49-62`, paper approach_2):
    per-channel probabilities pass through sigmoid, per-channel
    importance logits through a 2-way softmax, and the fused score is
    the importance-weighted sum of the probabilities —
    `softmax(imp)·sigmoid(prob)` summed over the two channels. Pure
    scalar expressions, whole-stage-codegen, zero shuffle."""
    w_img = pairwise_softmax(imp_img, imp_meta)
    return w_img * sigmoid(prob_img) + (F.lit(1.0) - w_img) * sigmoid(prob_meta)


def se_gate(img: Column, meta: Column) -> Column:
    """C6 SE-style gating (`mymodels.py:89-94`, paper approach_3):
    the metadata feature vector, squashed through sigmoid, gates the
    image feature vector elementwise — `zip_with(img, meta,
    (x, y) -> x * sigmoid(y))`. Native higher-order function; the
    downstream linear head is a dot product against a weight array
    (see `similarity.dot`)."""
    return F.zip_with(
        img,
        meta,
        lambda x, y: x.cast("double") * (F.lit(1.0) / (F.lit(1.0) + F.exp(-y.cast("double")))),
    )


def cat_concat(img: Column, meta: Column) -> Column:
    """C7 CAT fusion (`mymodels.py:126-131`, paper approach_1):
    feature-level fusion is plain array concatenation ahead of the
    linear head."""
    return F.concat(
        F.transform(img, lambda x: x.cast("double")),
        F.transform(meta, lambda x: x.cast("double")),
    )
