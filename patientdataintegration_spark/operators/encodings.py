"""Feature encodings (SURVEY.md §2.9; reference `encodings_v1`,
`functions_v2.py:142-220`).

The reference dispatches on an `encoding_scheme` string and rewrites
columns eagerly with sklearn's MinMaxScaler or hand-rolled loops.
Here each scheme is a lazy, composable DataFrame transform:

- E1 `scale01`: global min/max via a 1-row aggregate + broadcast
  cross join (same no-collect pattern as imputation) — the scan and
  the rescale still fuse into one whole-stage-codegen pass each.
- E2 `onehot`: `when` chains emitting flat 0/1 indicator columns
  (the reference's vector layout `functions_v2.py:165-193`); an
  array variant assembles them with `array()` for ML consumers.
- E3/E4 `classified_2/3`: threshold bucketing (`functions_v2.py:
  198-218`) as chained `when` — equivalent to `Bucketizer` but
  stays in Catalyst.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def scale01(df: DataFrame, cols: Sequence[str], suffix: str = "_scaled") -> DataFrame:
    """Min-max scale columns to [0,1] using global aggregates (E1/W4).

    One aggregate job computes min+max for every column at once;
    constant-degenerate columns (min==max) map to 0.0 like sklearn.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    for c in cols:
        rng = F.col(f"_max_{c}") - F.col(f"_min_{c}")
        scaled = F.when(rng == 0, F.lit(0.0)).otherwise(
            (F.col(c) - F.col(f"_min_{c}")) / rng
        )
        out = out.withColumn(f"{c}{suffix}", scaled)
    return out.drop(*[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])


def bucketize_age2(age: Column) -> Column:
    """E3 `classified_2` (`functions_v2.py:210-218`): <=60 -> 0, >60 -> 1."""
    return F.when(age <= 60, F.lit(0)).otherwise(F.lit(1))


def bucketize_age3(age: Column) -> Column:
    """E4 `classified_3` (`functions_v2.py:198-208`): <=30 -> 0,
    (30,60] -> 1, >60 -> 2."""
    return F.when(age <= 30, F.lit(0)).when(age <= 60, F.lit(1)).otherwise(F.lit(2))


def onehot_columns(df: DataFrame, col: str, values: Sequence[int], prefix: str | None = None) -> DataFrame:
    """E2 onehot (`functions_v2.py:165-193`): one 0/1 indicator column
    per category value. Flat columns (not a vector) so the result is
    relational/oracle-checkable; `array()` them for an ML vector."""
    p = prefix or col
    out = df
    for v in values:
        out = out.withColumn(f"{p}_{v}", (F.col(col) == v).cast("int"))
    return out


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clamp values to the [p_lo, p_hi]
    discrete percentiles — the robust cousin of `scale01` that caps
    outliers before features reach a model (the reference min-max
    scales raw values, `functions_v2.py:142-163`, which one outlier
    distorts).

    Percentiles are `percentile_disc` by the rank definition: the
    value at ascending position `ceil(p * n)` within the group.
    Selecting an existing value (never interpolating) keeps the
    output bit-exact across engines: clamping is a comparison, not
    arithmetic.

    Plan: ONE shuffle on the group key serving three window passes
    (count+rank, bound propagation, clamp) — Catalyst keeps them in
    one exchange since all windows share the partitioning. At scale
    the group must be a real key (a global winsorize = single
    partition, same caveat as every global window)."""
    out_col = out_col or f"{value_col}_w"
    v = F.col(value_col)
    w = Window.partitionBy(group_col)
    ranked = df.withColumn("_n", F.count(F.lit(1)).over(w)).withColumn(
        "_rn", F.row_number().over(w.orderBy(v.asc()))
    )
    lo_pos = F.greatest(F.lit(1), F.ceil(F.lit(p_lo) * F.col("_n")))
    hi_pos = F.ceil(F.lit(p_hi) * F.col("_n"))
    bounded = ranked.withColumn(
        "_lo", F.max(F.when(F.col("_rn") == lo_pos, v)).over(w)
    ).withColumn("_hi", F.max(F.when(F.col("_rn") == hi_pos, v)).over(w))
    return (
        bounded.withColumn(out_col, F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
        .drop("_n", "_rn", "_lo", "_hi")
    )
