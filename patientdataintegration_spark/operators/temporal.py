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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach `payload` of the matching right row
    within the `on` key:

    - ``direction='backward'`` (default): the LATEST right row with
      ``right.ts <= left.ts`` — DuckDB ``ASOF JOIN ... l.ts >= r.ts``,
      pandas ``merge_asof(direction='backward')``;
    - ``'forward'``: the EARLIEST right row with
      ``right.ts >= left.ts``;
    - ``'nearest'``: whichever of the two is closer in time, ties
      resolved backward.

    Right rows must be unique per (key, ts) — otherwise "the" match
    is ill-defined in any engine; pre-aggregate first.

    Output: all left columns + ``{prefix}{right_ts}`` (the matched
    row's timestamp) + ``{prefix}{p}`` for each payload column.
    ``how='inner'`` drops unmatched left rows; ``'left'`` keeps them
    with nulls.

    All three directions keep the same scale shape: tagged union +
    ONE shuffle on the key, with backward resolved by a running
    ``last(ignorenulls)`` and forward by the mirrored
    ``first(ignorenulls)`` over the following frame — never a range
    join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    on = list(on)
    payload = list(payload)
    carried = [right_ts] + [p for p in payload if p != right_ts]
    l_types = {f.name: f.dataType for f in left.schema.fields}
    r_types = {f.name: f.dataType for f in right.schema.fields}

    # Equal-timestamp visibility: right rows sort BEFORE left rows
    # (_side 0 < 1) so a simultaneous right row lands in the left
    # row's PRECEDING-inclusive frame — exact backward semantics. The
    # forward frame starts at currentRow, so with right-first ordering
    # it misses the equal-ts row; for pure 'forward' that's wrong, so
    # there the sides flip (left first). For 'nearest' the backward
    # arm already claims equal-ts matches at distance 0, which wins
    # every tie, so right-first ordering is correct there too.
    right_side = 1 if direction == "forward" else 0
    l_side = left.select(
        *left.columns,
        F.lit(1 - right_side).alias("_side"),
        F.col(left_ts).alias("_ts"),
        *[F.lit(None).cast(r_types[p]).alias(f"_r_{p}") for p in carried],
    )
    r_side = right.select(
        *on,
        *[
            F.lit(None).cast(l_types[c]).alias(c)
            for c in left.columns
            if c not in on
        ],
        F.lit(right_side).alias("_side"),
        F.col(right_ts).alias("_ts"),
        *[F.col(p).alias(f"_r_{p}") for p in carried],
    )
    u = l_side.unionByName(r_side)

    base = Window.partitionBy(*on).orderBy(F.col("_ts").asc(), F.col("_side").asc())
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    if direction == "backward":
        picks = [
            F.last(F.col(f"_r_{p}"), ignorenulls=True).over(w_back).alias(f"{prefix}{p}")
            for p in carried
        ]
    elif direction == "forward":
        picks = [
            F.first(F.col(f"_r_{p}"), ignorenulls=True).over(w_fwd).alias(f"{prefix}{p}")
            for p in carried
        ]
    else:  # nearest: resolve both arms, then choose per row
        both = [
            c
            for p in carried
            for c in (
                F.last(F.col(f"_r_{p}"), ignorenulls=True).over(w_back).alias(f"_b_{p}"),
                F.first(F.col(f"_r_{p}"), ignorenulls=True).over(w_fwd).alias(f"_f_{p}"),
            )
        ]
        staged = u.select(*left.columns, "_side", F.col("_ts"), *both)
        b_ts = F.col(f"_b_{right_ts}")
        f_ts = F.col(f"_f_{right_ts}")
        take_back = b_ts.isNotNull() & (
            f_ts.isNull()
            | (
                (F.unix_micros(F.col("_ts")) - F.unix_micros(b_ts))
                <= (F.unix_micros(f_ts) - F.unix_micros(F.col("_ts")))
            )
        )
        filled = staged.select(
            *left.columns,
            "_side",
            *[
                F.when(take_back, F.col(f"_b_{p}"))
                .otherwise(F.col(f"_f_{p}"))
                .alias(f"{prefix}{p}")
                for p in carried
            ],
        )
        out = filled.filter(F.col("_side") == 1).drop("_side")
        if how == "inner":
            out = out.filter(F.col(f"{prefix}{right_ts}").isNotNull())
        elif how != "left":
            raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
        return out

    filled = u.select(
        *left.columns,
        "_side",
        *picks,
    )
    out = filled.filter(F.col("_side") == (1 - right_side)).drop("_side")
    if how == "inner":
        out = out.filter(F.col(f"{prefix}{right_ts}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out


def resample_linear(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_us: int = 3_600_000_000,
    checkpoint_obs: bool = False,
) -> DataFrame:
    """Resample an irregular per-key series onto a fixed time grid
    with LINEAR interpolation between the nearest observations —
    the standard time-series regularization step before windowed
    feature extraction.

    The deduplicated observation relation has TWO plan consumers
    (the per-key bounds that build the grid, and the tagged union),
    so Spark executes its scan + dedup shuffle twice;
    ``checkpoint_obs=True`` materializes it once instead (the
    q130/q138/q208 multi-consumer discipline). Measured r7
    (tools/ab_q121.py, sf0.1, 9 interleaved reps): two-consumer
    median 1.825 s vs checkpointed 1.932 s — at this scale the
    checkpoint write costs MORE than re-running the cheap dedup
    aggregate, so the registered q121 keeps the default False. At
    100 TB the balance flips (the events scan dominates both
    consumers): checkpoint or parquet-materialize the obs relation
    there. Both variants are bit-identical in output.

    Scale shape: same tagged-union + window discipline as
    `asof_join` — grid points and observations are unioned and each
    grid point resolves (prev, next) neighbors with one
    last/first(ignorenulls) window pass, so every row shuffles
    exactly ONCE on the key. The naive formulation (grid x events
    range join, then argmin per grid point) is O(|grid| x |events|)
    per key before pruning; this is O((|grid|+|events|) log).

    Grid: hour-aligned boundaries within [min(ts), max(ts)] per key
    (first boundary >= min, last <= max), so both neighbors always
    exist. Ties at identical (key, timestamp) collapse to the
    lowest-event-id observation upstream; a grid point landing
    exactly on an observation returns that observation's value
    (frac = 0 — exact in IEEE arithmetic).

    Returns (key, us, v_interp): epoch-micros grid point and the
    interpolated value.
    """
    us = F.unix_micros(F.col(ts_col))
    obs = (
        events.select(F.col(key_col).alias("k"), us.alias("us"), F.col(value_col).alias("v"))
        .groupBy("k", "us")
        .agg(F.min("v").alias("v"))
    )
    if checkpoint_obs:
        obs = obs.localCheckpoint(eager=False)
    step = F.lit(int(step_us))
    bounds = obs.groupBy("k").agg(F.min("us").alias("lo_us"), F.max("us").alias("hi_us"))
    grid = (
        bounds.select(
            "k",
            # pure bigint arithmetic (add/mod) — never a double
            # division of epoch-micros, which loses exactness near
            # 2^53
            ((F.col("lo_us") + step - 1) - ((F.col("lo_us") + step - 1) % step)).alias("lo"),
            (F.col("hi_us") - (F.col("hi_us") % step)).alias("hi"),
        )
        .filter(F.col("lo") <= F.col("hi"))
        .select("k", F.explode(F.sequence("lo", "hi", step)).alias("us"))
    )
    tagged = obs.withColumn("kind", F.lit(0)).unionByName(
        grid.select("k", "us", F.lit(None).cast("double").alias("v"), F.lit(1).alias("kind"))
    )
    w = Window.partitionBy("k").orderBy("us", "kind")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    prev_v = F.last("v", ignorenulls=True).over(back)
    prev_us = F.last(F.when(F.col("v").isNotNull(), F.col("us")), ignorenulls=True).over(back)
    next_v = F.first("v", ignorenulls=True).over(fwd)
    next_us = F.first(F.when(F.col("v").isNotNull(), F.col("us")), ignorenulls=True).over(fwd)
    frac = (F.col("g_us") - F.col("p_us")).cast("double") / (
        F.col("n_us") - F.col("p_us")
    ).cast("double")
    interp = (
        F.when(F.col("p_us").isNull(), F.col("n_v"))
        .when(F.col("n_us").isNull(), F.col("p_v"))
        .when(F.col("n_us") == F.col("p_us"), F.col("p_v"))
        .otherwise(F.col("p_v") + (F.col("n_v") - F.col("p_v")) * frac)
    )
    return (
        tagged.select(
            "k",
            F.col("us").alias("g_us"),
            "kind",
            prev_v.alias("p_v"),
            prev_us.alias("p_us"),
            next_v.alias("n_v"),
            next_us.alias("n_us"),
        )
        .filter(F.col("kind") == 1)
        .select(
            F.col("k").alias(key_col),
            F.col("g_us").alias("us"),
            interp.alias("v_interp"),
        )
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    stream: each observation opens a version valid from its own
    timestamp until the NEXT observation of the same key (exclusive);
    the latest version is open-ended (null valid_to) — the standard
    CDC-to-warehouse materialization.

    Plan: ONE window (lead over the key) — no self-join, no range
    join; the 100 TB shape. Timestamps surface as epoch micros.

    Output: (key, version, value, valid_from_us, valid_to_us) with
    version numbered 1.. per key in time order.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    return df.select(
        F.col(key_col),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col(value_col),
        us.alias("valid_from_us"),
        F.lead(us).over(w).alias("valid_to_us"),
    )
