"""Macro metrics as native Spark aggregations (SURVEY.md §2.5).

The reference computes these with sklearn on collected NumPy arrays:

- balanced accuracy: `balanced_accuracy_score` at
  `functions_v2.py:358,452,507,536,561` (operator A9),
- AUROC: `roc_auc_score` at `ipynb cell 13:15-17` (operator A10),
- mean ± population-std over folds: `np.mean`/`np.std` at
  `ipynb cell 13:21-22` (operator A11).

Here they are pure DataFrame aggregations — no UDF, no collect — so
they distribute: balanced accuracy is a two-level hash aggregate
(partial + final on both levels, courtesy of Catalyst), AUROC is the
Mann-Whitney U statistic over average ranks computed with window
functions (exactly sklearn's tie handling), and the fold summary is
a plain grouped agg with `stddev_pop` (NumPy's default ddof=0 —
`stddev_samp` would NOT match the reference, SURVEY.md §7 "hard
parts").

Scale notes: balanced accuracy shuffles on (group, label) then
(group) — both tiny cardinality after partial aggregation. AUROC's
rank window shuffles on the group key and sorts by score within each
group; for a global (ungrouped) AUROC over billions of rows the
single-reducer sort would bottleneck, so `auroc` requires at least
one grouping column and callers at scale group by fold/approach
(cardinality >= parallelism). All downstream sums stay exact in
double precision (ranks are integers/halves < 2^53), so results are
bit-identical across engines and partitionings.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def balanced_accuracy(
    df: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
    group_cols: Sequence[str] = (),
    out_col: str = "bal_acc",
) -> DataFrame:
    """Macro-averaged recall (sklearn `balanced_accuracy_score`).

    Two-level aggregation: per-class recall, then unweighted mean of
    the per-class recalls within each group (A9).
    """
    hit = (F.col(pred_col) == F.col(label_col)).cast("double")
    per_class = df.groupBy(*group_cols, label_col).agg(F.avg(hit).alias("_recall"))
    if group_cols:
        return per_class.groupBy(*group_cols).agg(F.avg("_recall").alias(out_col))
    return per_class.agg(F.avg("_recall").alias(out_col))


def average_rank(score: str, group_cols: Sequence[str] = ()) -> Column:
    """Average (mid) rank of `score` within group — sklearn/SciPy tie
    semantics: min-rank + (ties - 1) / 2."""
    order = Window.partitionBy(*group_cols).orderBy(F.col(score))
    ties = Window.partitionBy(*group_cols, score)
    return F.rank().over(order) + (F.count(F.lit(1)).over(ties) - F.lit(1)) / F.lit(2.0)


def auroc(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    group_cols: Sequence[str] = (),
    out_col: str = "auroc",
) -> DataFrame:
    """Exact AUROC via the Mann-Whitney U statistic (A10).

        AUC = (sum(rank+) - n+(n+ + 1)/2) / (n+ * n-)

    with average ranks for ties — matches `roc_auc_score` exactly.

    Scale formulation: all rows tied on a score share one average
    rank, so the statistic only needs PER-SCORE counts, never
    per-row ranks. Stage 1 is a hash aggregate on (group, score) —
    partial aggregation shrinks the shuffle to |distinct scores| per
    group regardless of row count. Stage 2's window sort then runs
    over that compressed domain (a score histogram), not raw rows —
    the difference between sorting billions of rows and sorting a
    few thousand histogram buckets per group. avg_rank of a tie
    block = (#rows before it) + (block + 1)/2; every term is an
    integer or half, exact in double below 2^53.
    """
    pos = F.col(label_col).cast("bigint")
    hist = df.groupBy(*group_cols, score_col).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(pos).alias("_np")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(score_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.withColumn(
        "_arank",
        F.coalesce(F.sum("_n").over(w), F.lit(0)) + (F.col("_n") + F.lit(1)) / F.lit(2.0),
    )
    n_pos = F.sum("_np")
    n_neg = F.sum(F.col("_n") - F.col("_np"))
    rank_pos_sum = F.sum(F.col("_np") * F.col("_arank"))
    auc = (rank_pos_sum - n_pos * (n_pos + F.lit(1)) / F.lit(2.0)) / (n_pos * n_neg)
    if group_cols:
        return ranked.groupBy(*group_cols).agg(auc.alias(out_col))
    return ranked.agg(auc.alias(out_col))


def mean_std_over(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    round_digits: int = 6,
) -> DataFrame:
    """mean ± population std over folds/runs (A11, `np.std` ddof=0).

    stddev accumulates in a partition-order-dependent way, so it is
    rounded to keep results comparison-stable across engines.
    """
    aggs = [
        F.round(F.avg(value_col), 9).alias(f"mean_{value_col}"),
        F.round(F.stddev_pop(value_col), round_digits).alias(f"std_{value_col}"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)
