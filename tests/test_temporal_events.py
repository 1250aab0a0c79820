

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
