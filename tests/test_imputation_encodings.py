

def test_profile_matches_manual(spark):
    """Profiler stats vs hand-computed values on data with nulls."""
    from patientdataintegration_spark.operators.profiling import profile

    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, None), (None, "b"), (2.0, "a")], "x double, s string"
    )
    rows = {r.col_name: r for r in profile(df, ["x"], ["s"]).collect()}
    x, s = rows["x"], rows["s"]
    assert (x.n, x.n_null, x.n_distinct, x.min_num, x.max_num, x.sum_v) == (3, 1, 2, 1.0, 2.0, 5.0)
    assert (s.n, s.n_null, s.n_distinct, s.min_str, s.max_str) == (3, 1, 2, "a", "b")
    assert x.min_str is None and s.min_num is None
