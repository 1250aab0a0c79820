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


def coalesce_intervals(
    df: DataFrame,
    gap_seconds: int = 0,
    user_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-key interval union: merge intervals whose start lies
    within `gap_seconds` of the running maximum end of everything
    before them (the classic overlapping-intervals coalesce,
    generalized with a gap). Output one row per merged group:
    (user, start_us = min, end_us = max, n_events = sum of weights;
    weight 1 per input row when `weight_col` is None).

    The running-max spelling (cumulative MAX window over preceding
    ends, not lag) is what makes this correct for genuinely
    OVERLAPPING intervals, where the previous ROW's end is not the
    frontier. Plan shape: one shuffle on the key serves both the
    ordered window and the group aggregate — same discipline as
    `sessionize`. Point events embed as zero-length intervals
    (start = end = ts), which is how `sessionize_increment` merges a
    day's events into yesterday's session table."""
    gap_us = int(gap_seconds) * 1_000_000
    w = (
        Window.partitionBy(user_col)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = F.max(end_col).over(w)
    new_g = (
        F.when(
            frontier.isNull() | (F.col(start_col) - frontier > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    run = (
        Window.partitionBy(user_col)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    weight = F.col(weight_col) if weight_col else F.lit(1)
    tagged = df.select(
        user_col,
        F.col(start_col),
        F.col(end_col),
        weight.alias("_w"),
        new_g.alias("_new"),
    ).withColumn("_gid", F.sum("_new").over(run))
    return (
        tagged.groupBy(user_col, "_gid")
        .agg(
            F.min(start_col).alias("start_us"),
            F.max(end_col).alias("end_us"),
            F.sum("_w").cast("bigint").alias("n_events"),
        )
        .drop("_gid")
    )


def sessionize_increment(
    sessions_old: DataFrame,
    delta_us: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    check_precondition: bool = True,
) -> DataFrame:
    """Maintain a materialized session table under a day's new
    events WITHOUT re-sessionizing history. Precondition: every
    delta event is later than every event behind `sessions_old`
    (the nightly time-partitioned feed). Then only each user's LAST
    old session can interact with the delta — any earlier session
    is followed by an old session that started more than `gap`
    after it ended, and the delta is later still — so the
    maintenance is: keep the closed sessions verbatim, and
    gap-coalesce (last session as an interval) ∪ (delta events as
    zero-length intervals) per user. Bit-identical to full
    re-sessionization of old ∪ delta (the q249 oracle).

    `check_precondition` (default ON — the r9 verdict's fail-loud
    demand) guards the one semantic trapdoor IN-DAG: a delta event at
    or before a user's last CLOSED-session end + gap could have
    merged into (or bridged) a closed session, which this fast path
    keeps verbatim — silently wrong sessions vs recompute. The guard
    rides the already-computed `closed` relation (one per-user MAX +
    a join against the delta, the `ranking.py` raise_error idiom) and
    fires at EXECUTION time, the only time the delta's contents are
    known. Genuinely late feeds belong on `sessionize_repair_late`,
    which is exact for arbitrary late data.

    Scale: the closed sessions are untouched (at 100 TB: not even
    read, with the session table partitioned by last-activity day —
    only the hot tail is scanned); the coalesce shuffles one
    interval per ACTIVE user plus the day's events, never history;
    the guard join is delta-sized against one row per user with
    closed history.

    `sessions_old` columns: (user, start_us, end_us, n_events);
    `delta_us`: (user, us)."""
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(user_col).orderBy(
        F.col("end_us").desc(), F.col("start_us").desc()
    )
    ranked = sessions_old.select(
        user_col,
        "start_us",
        "end_us",
        F.col("n_events").alias("_w"),
        F.row_number().over(w).alias("_rk"),
    )
    closed = ranked.filter(F.col("_rk") > 1).drop("_rk")
    hot_last = ranked.filter(F.col("_rk") == 1).drop("_rk")
    hot_points = delta_us.select(
        user_col,
        F.col("us").alias("start_us"),
        F.col("us").alias("end_us"),
        F.lit(1).alias("_w"),
    )
    if check_precondition:
        frontier = closed.groupBy(user_col).agg(
            F.max("end_us").alias("_frontier")
        )
        hot_points = (
            hot_points.join(frontier, user_col, "left")
            .withColumn(
                "start_us",
                F.when(
                    F.col("_frontier").isNull()
                    | (F.col("start_us") > F.col("_frontier") + F.lit(gap_us)),
                    F.col("start_us"),
                ).otherwise(
                    F.raise_error(
                        F.lit(
                            "sessionize_increment: delta contains an event at"
                            " or before a closed session's end + gap — the"
                            " time-partitioned precondition is violated and"
                            " the fast path would silently mis-sessionize;"
                            " route late data through"
                            " sessionize_repair_late instead"
                        )
                    ).cast("bigint")
                ),
            )
            .select(user_col, "start_us", F.col("start_us").alias("end_us"), "_w")
        )
    merged = coalesce_intervals(
        hot_last.unionByName(hot_points),
        gap_seconds=gap_seconds,
        user_col=user_col,
        weight_col="_w",
    )
    return closed.select(
        user_col,
        "start_us",
        "end_us",
        F.col("_w").cast("bigint").alias("n_events"),
    ).unionByName(merged)


def sessionize_repair_late(
    sessions_old: DataFrame,
    delta_us: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
) -> DataFrame:
    """Late-data-COMPLETE session maintenance: exact for ARBITRARY
    deltas — late, out-of-order, inside old sessions, bridging two
    old sessions — at the cost of re-coalescing every session of the
    users PRESENT in the delta (never anyone else's, never raw
    history).

    Why this is exact (the hull lemma): sessionization of a point
    set equals gap-coalescing its zero-length intervals, and
    replacing any one session's points by its HULL interval (with
    the event count as weight) preserves every gap-coalesce result —
    inside a session consecutive events are ≤ gap apart, so a new
    point lands in the merged group iff it lands within gap of the
    hull, and two old sessions merge iff a new point chain bridges
    their hulls within gap (q256's oracle is the full
    re-sessionization; tests/test_properties.py drives random
    old/delta splits against recompute). Hence per touched user:
    coalesce(all old session hulls ∪ delta points) ==
    sessionize(all of that user's events), with no raw-history scan.

    This is the repair path `sessionize_increment`'s guard points
    late feeds at; the two compose as fast-path + slow-sliver: split
    the delta by the frontier test, increment the on-time part,
    repair the late part.

    Scale: untouched users' sessions pass through verbatim via one
    broadcast anti-join (the delta's user set is day-sized); touched
    users shuffle one interval per OLD SESSION plus the delta —
    bounded by active users' session counts, independent of event
    history volume.

    `sessions_old` columns: (user, start_us, end_us, n_events);
    `delta_us`: (user, us)."""
    active = delta_us.select(user_col).distinct()
    untouched = sessions_old.join(F.broadcast(active), user_col, "left_anti")
    touched = sessions_old.join(
        F.broadcast(active), user_col, "left_semi"
    ).select(
        user_col, "start_us", "end_us", F.col("n_events").alias("_w")
    )
    points = delta_us.select(
        user_col,
        F.col("us").alias("start_us"),
        F.col("us").alias("end_us"),
        F.lit(1).alias("_w"),
    )
    merged = coalesce_intervals(
        touched.unionByName(points),
        gap_seconds=gap_seconds,
        user_col=user_col,
        weight_col="_w",
    )
    return untouched.select(
        user_col,
        "start_us",
        "end_us",
        F.col("n_events").cast("bigint").alias("n_events"),
    ).unionByName(merged)
