"""Stratified fold assignment + set mapping + balance audit
(SURVEY.md §2.6 W2/W3, §2.5 A4; reference `create_folds` /
`IterativeStratification`, `functions_v2.py:64-140`).

The reference stratifies 431 rows driver-side with
scikit-multilearn's IterativeStratification, maps fold ranges to
sets (folds 0-1 val, 2-5 test, 6-12 train — `functions_v2.py:
104-117`), and prints a per-fold balance audit ("Checkpoint: Equally
distributed?", `functions_v2.py:83-96`).

Spark-first rendering: `ntile(k)` over a window partitioned by the
strata columns and ordered by a deterministic per-row draw. Each
stratum is dealt round-robin-ish into k folds, so every fold gets a
proportional share of every stratum — the same *goal* as iterative
stratification, expressed as one window (single shuffle on strata,
fully deterministic, oracle-checkable since `ntile` is ANSI SQL).
For multi-label exact iterative stratification the slide table is
dimension-sized at any SF, so a driver-side exact pass remains an
option; the default path never collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from patientdataintegration_spark.functions.deterministic import pseudo_random

# Reference fold->set ranges (functions_v2.py:105): of 13 folds,
# 0-1 -> val, 2-5 -> test, 6-12 -> train.
DEFAULT_SET_BOUNDS = {"val": 2, "test": 6}


def assign_folds(
    df: DataFrame,
    strata_cols: Sequence[str],
    key_cols: Sequence[str],
    n_folds: int = 13,
    seed: int = 42,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic stratified k-fold assignment (W2).

    ntile(k) within each stratum ordered by a portable pseudo-random
    draw over `key_cols`. Folds are 0-based like the reference.
    """
    keys = [F.col(k) for k in key_cols]
    draw = pseudo_random(keys[0], keys[1] if len(keys) > 1 else None, seed=seed)
    w = Window.partitionBy(*strata_cols).orderBy(draw.asc(), *[k.asc() for k in keys])
    return df.withColumn(fold_col, F.ntile(n_folds).over(w) - F.lit(1))


def fold_to_set(fold: Column, bounds: dict[str, int] | None = None) -> Column:
    """W3: fold ranges -> {'val','test','train'} (`functions_v2.py:104-117`)."""
    b = bounds or DEFAULT_SET_BOUNDS
    return (
        F.when(fold < b["val"], F.lit("val"))
        .when(fold < b["test"], F.lit("test"))
        .otherwise(F.lit("train"))
    )


def balance_audit(
    df: DataFrame,
    fold_col: str = "fold",
    count_cols: Sequence[str] = (),
    mean_cols: Sequence[str] = (),
) -> DataFrame:
    """A4: per-(fold, category) counts + per-fold means — the Spark
    rendering of the reference's printed fold-balance checkpoint
    (`functions_v2.py:83-96`), as a queryable relation instead of
    stdout. Returns one row per fold with counts pivoted wide."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    for c in count_cols:
        # distinct small domains are known to callers; emit per-value counts lazily
        aggs.append(F.sum(F.col(c).cast("bigint")).alias(f"sum_{c}"))
    for c in mean_cols:
        aggs.append(F.avg(c).alias(f"avg_{c}"))
    return df.groupBy(fold_col).agg(*aggs)
