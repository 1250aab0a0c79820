

def test_resample_linear_hand_computed(spark):
    """Grid points between two observations interpolate linearly;
    a grid point exactly on an observation returns its value."""
    import datetime as dt

    from patientdataintegration_spark.operators.temporal import resample_linear

    H = 3_600_000_000
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return base + dt.timedelta(seconds=sec)

    df = spark.createDataFrame(
        [
            (1, at(0), 10.0),        # exactly on the hour grid
            (1, at(2 * 3600), 30.0), # two hours later, on-grid
            (2, at(1800), 5.0),      # off-grid observations
            (2, at(5400), 9.0),
        ],
        "user_id bigint, ts timestamp, value double",
    )
    rows = {(r.user_id, r.us): r.v_interp for r in resample_linear(df).collect()}
    t0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    # user 1: grid at 0h, 1h, 2h — midpoint interpolates to 20
    assert rows[(1, t0)] == 10.0
    assert rows[(1, t0 + H)] == 20.0
    assert rows[(1, t0 + 2 * H)] == 30.0
    # user 2: only grid point is 1h, halfway between 0.5h and 1.5h
    assert rows[(2, t0 + H)] == 7.0
    assert len(rows) == 4


def test_session_gap_boundary_semantics(spark):
    """Pin the exact-gap boundary rule for BOTH session spellings:
    an event exactly `gap` after the previous one MERGES into the
    session, one microsecond past SPLITS. Verified empirically for
    Spark's native session_window; sessionize implements the same
    strictly-greater split (`> gap_us`) — so the two agree at every
    boundary, which is what lets q85 carry an exact SQL oracle."""
    import datetime as dt

    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.sessionize import sessionize

    base = dt.datetime(2024, 1, 1)

    def at(us):
        return base + dt.timedelta(microseconds=us)

    gap_us = 60_000_000  # 60 s
    df = spark.createDataFrame(
        [
            (1, 10, at(0), 0.0),
            (1, 11, at(gap_us), 0.0),          # exactly gap → merges
            (1, 12, at(2 * gap_us + 1), 0.0),  # 1 µs past → splits
        ],
        "user_id bigint, event_id bigint, ts timestamp, value double",
    )

    native = (
        df.groupBy("user_id", F.session_window("ts", "60 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros("w.start").alias("start_us"), "n")
    )
    ours = sessionize(df, gap_seconds=60).select("start_us", F.col("n_events").alias("n"))

    expect = {(r.start_us, r.n) for r in native.collect()}
    got = {(r.start_us, r.n) for r in ours.collect()}
    assert expect == got
    assert {n for _, n in got} == {2, 1}  # first session holds the boundary event


def test_asof_join_directions_hand_computed(spark):
    """Backward / forward / nearest on a tiny series with boundary
    cases: equal timestamps (both directions must match at distance
    0), nearest ties (resolved backward), and no-match edges."""
    import datetime as dt

    from patientdataintegration_spark.operators.temporal import asof_join

    base = dt.datetime(2024, 1, 1)

    def at(s):
        return base + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [
            (1, 100, at(50), 0.0),   # between clicks at 40 and 60 (tie)
            (1, 101, at(40), 0.0),   # exactly on click at 40
            (1, 102, at(5), 0.0),    # before all clicks
            (1, 103, at(95), 0.0),   # after all clicks
        ],
        "user_id bigint, event_id bigint, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(1, at(40), 4.0), (1, at(60), 6.0)],
        "user_id bigint, ts timestamp, value double",
    )

    def run(direction, how="left"):
        out = asof_join(
            left, right, on=["user_id"], payload=["value"], how=how,
            direction=direction,
        )
        return {r.event_id: r.asof_value for r in out.collect()}

    assert run("backward") == {100: 4.0, 101: 4.0, 102: None, 103: 6.0}
    assert run("forward") == {100: 6.0, 101: 4.0, 102: 4.0, 103: None}
    # nearest: 100 is equidistant (10s each way) → backward wins (4.0)
    assert run("nearest") == {100: 4.0, 101: 4.0, 102: 4.0, 103: 6.0}
    # inner drops the unmatched edges
    assert set(run("backward", how="inner")) == {100, 101, 103}
    assert set(run("forward", how="inner")) == {100, 101, 102}


def test_scd2_intervals_hand_computed(spark):
    """Each observation's validity runs to the next; latest is
    open-ended; versions number 1.. in time order."""
    import datetime as dt

    from patientdataintegration_spark.operators.temporal import scd2_intervals

    base = dt.datetime(2024, 1, 1)

    def at(s):
        return base + dt.timedelta(seconds=s)

    df = spark.createDataFrame(
        [(1, 10, at(0), 1.0), (1, 11, at(60), 2.0), (2, 12, at(30), 9.0)],
        "user_id bigint, event_id bigint, ts timestamp, value double",
    )
    rows = {
        (r.user_id, r.version): (r.value, r.valid_from_us, r.valid_to_us)
        for r in scd2_intervals(df).collect()
    }
    t0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert rows == {
        (1, 1): (1.0, t0, t0 + 60_000_000),
        (1, 2): (2.0, t0 + 60_000_000, None),
        (2, 1): (9.0, t0 + 30_000_000, None),
    }


def test_pagerank_star_graph(spark):
    """On a star (hub connected to 3 leaves) the hub outranks every
    leaf, leaves tie exactly, and total mass stays 1."""
    from patientdataintegration_spark.operators.graph import pagerank

    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "doc_a bigint, doc_b bigint"
    )
    ranks = {r.node: r.rank for r in pagerank(pairs, iterations=5).collect()}
    assert set(ranks) == {0, 1, 2, 3}
    assert ranks[1] == ranks[2] == ranks[3]
    assert ranks[0] > ranks[1]
    assert abs(sum(ranks.values()) - 1.0) < 1e-6


def test_coalesce_intervals_overlapping(spark):
    """The running-max frontier vs the lag trap: interval A covers B
    entirely, so B's end is NOT the frontier for C — a lag-based
    merge would wrongly split [A∪B] from C."""
    from patientdataintegration_spark.operators.sessionize import (
        coalesce_intervals,
    )
    from pyspark.sql import functions as F

    iv = spark.createDataFrame(
        [
            (1, 0, 100, 2),    # A
            (1, 10, 20, 1),    # B inside A
            (1, 105, 110, 1),  # C: within gap 10 of A's end, not B's
            (1, 300, 310, 1),  # D: separate
            (2, 0, 5, 1),      # other user untouched
        ],
        "user_id bigint, start_us bigint, end_us bigint, w bigint",
    )
    out = coalesce_intervals(
        iv, gap_seconds=0, weight_col="w"
    )  # gap 0 s, but A end 100 -> C start 105 gap is 5 MICROseconds
    rows = sorted(
        out.filter(F.col("user_id") == 1).collect(),
        key=lambda r: r["start_us"],
    )
    # gap_seconds=0 -> gap_us=0: C (105) does NOT merge with A (end 100)
    assert [(r["start_us"], r["end_us"], r["n_events"]) for r in rows] == [
        (0, 100, 3),
        (105, 110, 1),
        (300, 310, 1),
    ]
    # with a 1 s gap (1e6 us) both holes (5 us, 190 us) close
    merged = coalesce_intervals(iv, gap_seconds=1, weight_col="w")
    r1 = sorted(
        merged.filter(F.col("user_id") == 1).collect(),
        key=lambda r: r["start_us"],
    )
    assert [(r["start_us"], r["end_us"], r["n_events"]) for r in r1] == [
        (0, 310, 5)
    ]


def test_sessionize_increment_matches_full(spark):
    """Maintained sessions == full re-sessionization on a synthetic
    feed exercising: delta extending the last session, delta opening
    a new session, a delta-only new user, and an untouched user."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.sessionize import (
        sessionize,
        sessionize_increment,
    )

    GAP = 10  # seconds
    CUT = 1_000_000_000  # us
    rows = [
        # user 1: old session ends just before cut; delta extends it
        (1, 100, 999_000_000), (1, 101, 999_500_000),
        (1, 102, 1_000_200_000),  # within 10 s of 999.5 s -> merges
        # user 1 second delta burst far later -> new session
        (1, 103, 2_000_000_000), (1, 104, 2_001_000_000),
        # user 2: old only, two sessions
        (2, 200, 100_000_000), (2, 201, 500_000_000),
        # user 3: delta only
        (3, 300, 1_500_000_000),
    ]
    e = spark.createDataFrame(
        [(u, i, ts) for u, i, ts in rows],
        "user_id bigint, event_id bigint, us bigint",
    ).select(
        "user_id", "event_id", F.timestamp_micros("us").alias("ts"), "us"
    )
    old_ev = e.filter(F.col("us") < CUT)
    delta = e.filter(F.col("us") >= CUT).select("user_id", "us")
    sessions_old = sessionize(old_ev, gap_seconds=GAP).select(
        "user_id", "start_us", "end_us", "n_events"
    )
    got = sessionize_increment(sessions_old, delta, gap_seconds=GAP)
    want = sessionize(e, gap_seconds=GAP).select(
        "user_id", "start_us", "end_us", "n_events"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_sessionize_increment_guard_rejects_late_delta(spark):
    """r9 verdict item 4: a delta event at or before a CLOSED
    session's end + gap must fail LOUD (in-DAG raise_error), not
    silently mis-sessionize."""
    import pytest
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.sessionize import (
        sessionize,
        sessionize_increment,
    )

    GAP = 10  # seconds
    rows = [
        (1, 100, 100_000_000), (1, 101, 500_000_000),  # two old sessions
    ]
    e = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, us bigint"
    ).select("user_id", "event_id", F.timestamp_micros("us").alias("ts"), "us")
    sessions_old = sessionize(e, gap_seconds=GAP).select(
        "user_id", "start_us", "end_us", "n_events"
    )
    # closed session = [100s]; a delta at 105s is within gap of its end
    late = spark.createDataFrame(
        [(1, 105_000_000)], "user_id bigint, us bigint"
    )
    with pytest.raises(Exception, match="sessionize_increment"):
        sessionize_increment(sessions_old, late, gap_seconds=GAP).collect()
    # ...but a delta safely after closed-end + gap still passes, even
    # though it is BEFORE the last session (the exact precondition is
    # per-closed-session, not global ordering)
    ok = spark.createDataFrame(
        [(1, 130_000_000)], "user_id bigint, us bigint"
    )
    got = sessionize_increment(sessions_old, ok, gap_seconds=GAP)
    full = sessionize(
        e.unionByName(
            spark.createDataFrame(
                [(1, 999, 130_000_000)],
                "user_id bigint, event_id bigint, us bigint",
            ).select(
                "user_id", "event_id",
                F.timestamp_micros("us").alias("ts"), "us",
            )
        ),
        gap_seconds=GAP,
    ).select("user_id", "start_us", "end_us", "n_events")
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0


def test_sessionize_repair_late_bridges_and_matches_full(spark):
    """sessionize_repair_late == full recompute on adversarial late
    data: a late event BRIDGING two old sessions (they must merge),
    a late event inside an old session, one before the user's first
    session, a late-only new user, and an untouched user."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.sessionize import (
        sessionize,
        sessionize_repair_late,
    )

    GAP = 10  # seconds
    old_rows = [
        # user 1: sessions [100s..101s] and [115s..116s] (14 s apart)
        (1, 100, 100_000_000), (1, 101, 101_000_000),
        (1, 102, 115_000_000), (1, 103, 116_000_000),
        # user 2: untouched
        (2, 200, 50_000_000),
    ]
    late_rows = [
        (1, 900, 108_000_000),   # bridges the two sessions of user 1
        (1, 901, 100_500_000),   # inside the first session
        (1, 902, 50_000_000),    # before everything -> own session
        (3, 903, 70_000_000),    # late-only new user
    ]
    mk = lambda rows: spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, us bigint"
    ).select("user_id", "event_id", F.timestamp_micros("us").alias("ts"), "us")
    old_e, late_e = mk(old_rows), mk(late_rows)
    sessions_old = sessionize(old_e, gap_seconds=GAP).select(
        "user_id", "start_us", "end_us", "n_events"
    )
    got = sessionize_repair_late(
        sessions_old, late_e.select("user_id", "us"), gap_seconds=GAP
    )
    want = sessionize(old_e.unionByName(late_e), gap_seconds=GAP).select(
        "user_id", "start_us", "end_us", "n_events"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the bridge really merged: user 1 has sessions {50s}, {100..116s}
    u1 = sorted(
        (r["start_us"], r["end_us"], r["n_events"])
        for r in got.filter("user_id = 1").collect()
    )
    assert u1 == [
        (50_000_000, 50_000_000, 1),
        (100_000_000, 116_000_000, 6),
    ]
