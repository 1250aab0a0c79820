"""Gap-based sessionization — batch formulation.

Classic inactivity-gap sessions: consecutive events of a user belong
to one session while the gap between them stays under `gap`;
a longer gap starts a new session. Not in the reference (no
event-time data there); this is the canonical event-analytics
operator our `events` table calls for, and the batch twin of the
stateful streaming version in `streaming/sessions.py`.

Plan shape: ONE shuffle on the user key serves both the lag window
and the running session counter (same partitioning, same ordering —
Catalyst reuses the sort), then the session aggregate is a hash agg
on (user, session) which partial-aggregates map-side. Per-user event
counts are the skew axis at 100 TB; a power user's events still fit
one partition's sort spill, and nothing here is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based sessions and aggregate one row per session.

    Output: (user_id, session_id, start_us, end_us, n_events) with
    session_id numbered 1.. per user in time order, timestamps as
    epoch microseconds (engine-portable, exact).
    """
    gap_us = int(gap_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    new_session = (
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    run = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = df.select(
        user_col,
        F.col(ts_col),
        F.col(order_tiebreak),
        us.alias("_us"),
        new_session.alias("_new"),
    ).withColumn("session_id", F.sum("_new").over(run))
    return (
        tagged.groupBy(user_col, "session_id")
        .agg(
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
