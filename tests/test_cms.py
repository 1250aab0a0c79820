"""DataFrame-native Count-Min sketch (operators/cms.py): the
no-underestimate invariant, merge associativity (slice sketches sum
to the flat sketch counter-for-counter), deterministic estimates,
bounded state size, and forced-collision behavior at tiny width.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from patientdataintegration_spark.operators.cms import (
    cms_build,
    cms_merge,
    cms_query,
)


def _zipf_df(spark):
    # heavy skew: item i appears 200//(i+1) times, 40 distinct items
    rows = []
    for i in range(40):
        rows += [(f"item{i}",)] * (200 // (i + 1))
    return spark.createDataFrame(rows, "v string")


def _exact(spark):
    return (
        _zipf_df(spark)
        .groupBy(F.col("v").alias("item"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )


def test_cms_never_underestimates(spark):
    df = _zipf_df(spark)
    state = cms_build(df, "v")
    out = cms_query(state, _exact(spark), "item").collect()
    assert len(out) == 40
    assert all(r["cms_est"] >= r["n_exact"] for r in out)


def test_cms_exact_when_collision_free(spark):
    # 40 items into 4x1024 counters with the fixed seed: measured
    # collision-free, so min-over-rows returns the true counts
    df = _zipf_df(spark)
    out = cms_query(cms_build(df, "v"), _exact(spark), "item").collect()
    assert all(r["cms_est"] == r["n_exact"] for r in out)


def test_cms_merge_matches_flat_counters(spark):
    # counter-wise: sum of slice sketches == sketch of the union
    df = _zipf_df(spark).withColumn("slice", F.monotonically_increasing_id() % 3)
    slices = [df.filter(F.col("slice") == i) for i in range(3)]
    merged = cms_merge([cms_build(s, "v") for s in slices])
    flat = cms_build(df, "v")
    joined = merged.alias("m").join(
        flat.alias("f"), ["d", "w"], "full_outer"
    )
    mismatches = joined.filter(
        F.coalesce(F.col("m.c"), F.lit(0)) != F.coalesce(F.col("f.c"), F.lit(0))
    )
    assert mismatches.count() == 0


def test_cms_state_is_bounded(spark):
    # state rows <= depth * width regardless of input volume
    df = _zipf_df(spark)
    assert cms_build(df, "v", depth=4, width=64).count() <= 4 * 64


def test_cms_forced_collisions_still_upper_bound(spark):
    # width 4 forces heavy collisions: estimates inflate but never
    # drop below truth, and never exceed the slice total
    df = _zipf_df(spark)
    n_total = df.count()
    state = cms_build(df, "v", depth=2, width=4)
    out = cms_query(state, _exact(spark), "item", depth=2, width=4).collect()
    assert all(r["n_exact"] <= r["cms_est"] <= n_total for r in out)


def test_cms_unseen_item_estimates_bounded_by_collisions(spark):
    # an item the sketch never saw reads only collision mass — with
    # the default width it reads 0 here
    df = _zipf_df(spark)
    probe = spark.createDataFrame([("never-seen",)], "item string")
    out = cms_query(cms_build(df, "v"), probe, "item").collect()
    assert out[0]["cms_est"] == 0


def test_cms_query_reserved_column_collision_raises(spark):
    """Caller item columns named 'd'/'w' used to be clobbered by the
    probe withColumns (r8 ADVICE); probes now ride reserved temp
    names and a genuine reserved-name collision raises."""
    import pytest

    from patientdataintegration_spark.operators.cms import cms_build, cms_query

    items = spark.createDataFrame([("a", 7), ("b", 9)], "item string, d bigint")
    state = cms_build(items, "item")
    # 'd' passes through untouched now
    out = cms_query(state, items, "item").orderBy("item").collect()
    assert [r["d"] for r in out] == [7, 9]
    clash = items.withColumnRenamed("d", "_cms_d")
    with pytest.raises(ValueError, match="_cms_d"):
        cms_query(state, clash, "item")
