"""Single-pass table profiler: per-column stats in ONE scan.

A training-data pipeline profiles every ingested table (null rates,
ranges, cardinalities) before admission; the reference does this
imperatively, one pandas pass per column (`functions_v2.py:32-60`).
At 100 TB, N passes over the table is the difference between one
pipeline stage and N — so every column's statistics compile into a
single wide aggregate (one scan, one map-side-combined hash agg,
one result row), then unpivot driver-side into the long
(column, stat...) report shape via a literal-only `stack`.

Exact-distinct counts use Spark's multi-`count_distinct` Expand
strategy: the scan is replicated (n_distinct_cols + 1)x in the
Expand operator — still one pass over storage, but row volume
multiplies. At extreme widths swap `approx_count_distinct` (HLL,
mergeable, no Expand) — the report schema doesn't change, which is
why `n_distinct` is a plain bigint column rather than something
structural.

Complement to `operators/quality_checks` (pass/fail predicates);
this is the descriptive side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def profile(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
) -> DataFrame:
    """Profile the given columns in one scan.

    Returns one row per column:
    (col_name, n, n_null, n_distinct, min_num, max_num, sum_v,
     min_str, max_str) — numeric stats null for string columns and
    vice versa. `sum_v` goes through decimal(18,6) so the report is
    bit-stable across partitionings (the oracle-exactness contract).
    """
    aggs: list = []
    for c in numeric_cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__n_null"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min_num"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max_num"),
            F.sum(F.col(c).cast("decimal(18,6)")).cast("double").alias(f"{c}__sum"),
        ]
    for c in string_cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__n_null"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(c).alias(f"{c}__min_str"),
            F.max(c).alias(f"{c}__max_str"),
        ]
    wide = df.agg(*aggs)

    # unpivot the single wide row into (column, stats...) — a
    # literal-only projection, no second scan
    null_double = F.lit(None).cast("double")
    null_string = F.lit(None).cast("string")
    rows = []
    for c in numeric_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__n_null").alias("n_null"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_num").alias("min_num"),
                F.col(f"{c}__max_num").alias("max_num"),
                F.col(f"{c}__sum").alias("sum_v"),
                null_string.alias("min_str"),
                null_string.alias("max_str"),
            )
        )
    for c in string_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__n_null").alias("n_null"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                null_double.alias("min_num"),
                null_double.alias("max_num"),
                null_double.alias("sum_v"),
                F.col(f"{c}__min_str").alias("min_str"),
                F.col(f"{c}__max_str").alias("max_str"),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("col_name")
    )
