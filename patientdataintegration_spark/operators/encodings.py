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

from pyspark.sql import Column, DataFrame, functions as F


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
