"""Declarative data-quality checks — the validation gate a training
pipeline runs before a table is admitted (the reference's analogue is
its null audit + fold-balance report, `functions_v2.py:32-60,84-95`,
done imperatively per column).

Design: every check compiles to ONE conditional aggregate expression,
and all checks over a table run in a SINGLE scan + single partial
aggregate — no per-check passes. At 100 TB this is the difference
between one pipeline stage and N of them. The report is a long table
(check_name, n_violations, n_rows, violation_ratio) so it can be
unioned across tables and thresholds applied declaratively.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    """One named predicate; rows where `violated` is true count
    against the check."""

    name: str
    violated: Column


def not_null(col: str) -> Check:
    return Check(f"not_null_{col}", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Check:
    return Check(
        f"range_{col}", ~F.col(col).between(F.lit(lo), F.lit(hi)) | F.col(col).isNull()
    )


def matches(col: str, pattern: str, name: str | None = None) -> Check:
    return Check(name or f"matches_{col}", ~F.col(col).rlike(pattern))


def accepted_values(col: str, values: list) -> Check:
    return Check(f"accepted_{col}", ~F.col(col).isin(values))


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All checks in one scan: each compiles to a conditional SUM in
    the same aggregate, then a stack() unpivots to the long report.
    Output: (check_name, n_violations, n_rows, violation_ratio)."""
    aggs = [
        F.sum(c.violated.cast("bigint")).alias(f"v_{i}") for i, c in enumerate(checks)
    ]
    row = df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    pairs = ", ".join(f"'{c.name}', v_{i}" for i, c in enumerate(checks))
    return row.selectExpr(
        f"stack({len(checks)}, {pairs}) as (check_name, n_violations)", "n_rows"
    ).select(
        "check_name",
        "n_violations",
        "n_rows",
        (F.col("n_violations").cast("double") / F.col("n_rows")).alias(
            "violation_ratio"
        ),
    )


def uniqueness_check(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key-uniqueness needs its own (single) shuffle: group by the
    key, count rows landing on duplicated keys. Same report schema
    as `run_checks` so the two lanes union."""
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias(
                "n_violations"
            ),
            F.sum("n").alias("n_rows"),
        )
    )
    return dup.select(
        F.lit("unique_" + "_".join(key_cols)).alias("check_name"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_violations").cast("double") / F.col("n_rows")).alias(
            "violation_ratio"
        ),
    )
