

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
