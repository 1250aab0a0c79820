"""Missing-data handling as distributed aggregates (SURVEY.md §2.5
A1-A3; reference `handling_missing_data`, `functions_v2.py:27-62`).

The reference computes the fill value eagerly with NumPy over the
whole (tiny) table — `np.mean(df.age[notnull])` for continuous
columns, per-value counts + argmax for categoricals — then mutates
rows in place. Here both the statistic and the fill are lazy
DataFrame operations:

- the statistic is a 1-row aggregate DataFrame,
- the fill is `coalesce(col, stat)` after a **broadcast cross join**
  of that 1-row frame — no `collect()`, no driver round-trip, so the
  imputation composes into a single job even when the input is
  100 TB (the aggregate is a partial+final hash agg; the cross join
  broadcasts one row).

Mode tie-breaking matches NumPy argmax-first-max on sorted category
values: ties resolve to the LOWEST value (`functions_v2.py:43`
iterates category values in ascending order; SURVEY.md §7 hard part
(a)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mode_value(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """1-row DataFrame holding the most frequent non-null value of
    `col`; ties break to the lowest value (A2).

    groupBy-count + max_by over a struct rather than `mode()` so the
    tie-break is explicit and portable. The struct comparison orders
    by (count DESC, value ASC) via negated value.
    """
    out = out_col or f"mode_{col}"
    counts = df.filter(F.col(col).isNotNull()).groupBy(col).agg(F.count(F.lit(1)).alias("_cnt"))
    # max_by with a (count, -value) key == highest count, lowest value on ties.
    return counts.agg(
        F.max_by(F.col(col), F.struct(F.col("_cnt"), (-F.col(col)).alias("_negv"))).alias(out)
    )


def impute_mean(df: DataFrame, col: str) -> DataFrame:
    """Fill nulls in a continuous column with the non-null mean (A1+A3).

    `avg` skips nulls natively; the 1-row mean is cross-joined
    (broadcast by AQE — one row) and coalesced in.
    """
    mean_df = df.agg(F.avg(col).alias("_fill"))
    return (
        df.crossJoin(F.broadcast(mean_df))
        .withColumn(col, F.coalesce(F.col(col), F.col("_fill")))
        .drop("_fill")
    )


def impute_mode(df: DataFrame, col: str) -> DataFrame:
    """Fill nulls in a categorical column with its mode (A2+A3)."""
    mode_df = mode_value(df, col, "_fill")
    return (
        df.crossJoin(F.broadcast(mode_df))
        .withColumn(col, F.coalesce(F.col(col), F.col("_fill")))
        .drop("_fill")
    )
