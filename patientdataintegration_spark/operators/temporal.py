"""Temporal operators: as-of (point-in-time) join.

Not in the reference (its joins are all tiny-dimension equi-lookups,
SURVEY.md §2.4 "Not present: theta/range/as-of"); this is a
capability Spark itself lacks as a built-in, implemented the
scale-correct way: a tagged union + one window pass, NOT a range
join. A range-join formulation (`l.ts >= r.ts` + argmax) explodes to
O(|L|·|R|) per key before pruning; the union-window formulation
shuffles each row exactly once on the join key and resolves the
"latest right row at-or-before" with a running `last(ignorenulls)`
— O((|L|+|R|) log) via sort within partitions. Same pattern as
Flink's event-time temporal join and pandas `merge_asof`, expressed
with DataFrame primitives so Catalyst/AQE still handle skew and
partial aggregation around it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] = ("value",),
    prefix: str = "asof_",
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach `payload` of the LATEST right row with
    ``right.ts <= left.ts`` within the `on` key (backward as-of join,
    equality allowed — same semantics as DuckDB ``ASOF JOIN`` and
    pandas ``merge_asof(direction='backward')``).

    Right rows must be unique per (key, ts) — otherwise "the" latest
    row is ill-defined in any engine; pre-aggregate first.

    Output: all left columns + ``{prefix}{right_ts}`` (the matched
    row's timestamp) + ``{prefix}{p}`` for each payload column.
    ``how='inner'`` drops left rows with no prior right row;
    ``'left'`` keeps them with nulls.
    """
    on = list(on)
    payload = list(payload)
    carried = [right_ts] + [p for p in payload if p != right_ts]
    l_types = {f.name: f.dataType for f in left.schema.fields}
    r_types = {f.name: f.dataType for f in right.schema.fields}

    l_side = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ts"),
        *[F.lit(None).cast(r_types[p]).alias(f"{prefix}{p}") for p in carried],
    )
    r_side = right.select(
        *on,
        *[
            F.lit(None).cast(l_types[c]).alias(c)
            for c in left.columns
            if c not in on
        ],
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        *[F.col(p).alias(f"{prefix}{p}") for p in carried],
    )
    u = l_side.unionByName(r_side)

    # right rows sort BEFORE left rows at equal ts (_side 0 < 1), so
    # an exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *left.columns,
        "_side",
        *[
            F.last(F.col(f"{prefix}{p}"), ignorenulls=True).over(w).alias(f"{prefix}{p}")
            for p in carried
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if how == "inner":
        out = out.filter(F.col(f"{prefix}{right_ts}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out
