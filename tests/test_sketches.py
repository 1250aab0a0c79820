"""Mergeable-sketch operators (operators/sketches.py): exactness of
the exact twins, verdict correctness in the exact regime, heavy-
hitter recall in the approximate regime, and merge/rollup coherence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from patientdataintegration_spark.operators.sketches import (
    hll_rollup,
    sharded_top_k,
    theta_set_cardinalities,
)


def _groups_df(spark):
    # 3 groups; distinct values per group 50/30/10, grand distinct 60
    rows = []
    for v in range(50):
        rows.append(("g1", v))
        rows.append(("g1", v))  # duplicates must not count
    for v in range(30):
        rows.append(("g2", v))
    for v in range(50, 60):
        rows.append(("g3", v))
    return spark.createDataFrame(rows, "g string, v bigint")


def test_hll_rollup_exact_regime(spark):
    out = {
        (r["grain"], r["bucket"]): (r["n_exact"], r["within_tol"])
        for r in hll_rollup(_groups_df(spark), "g", "v", tol_pct=10).collect()
    }
    assert out[("group", "g1")] == (50, True)
    assert out[("group", "g2")] == (30, True)
    assert out[("group", "g3")] == (10, True)
    # the rollup row merges SKETCHES: g1 ∪ g2 ∪ g3 = {0..59}
    assert out[("all", "ALL")] == (60, True)
    assert len(out) == 4


def test_theta_set_algebra_exact_regime(spark):
    # A = {0..99}, B = {50..149}: |A|=|B|=100, ∪=150, ∩=50, \\=50
    a = spark.createDataFrame([(v,) for v in range(100)], "v bigint")
    b = spark.createDataFrame([(v,) for v in range(50, 150)], "v bigint")
    out = {
        r["measure"]: (r["n_exact"], r["within_tol"])
        for r in theta_set_cardinalities(a, b, "v", tol_pct=10).collect()
    }
    assert out == {
        "a": (100, True),
        "b": (100, True),
        "union": (150, True),
        "inter": (50, True),
        "diff": (50, True),
    }


def test_theta_disjoint_sets(spark):
    # disjoint corpora: intersection 0 — the coalesce-to-0 path
    a = spark.createDataFrame([(v,) for v in range(40)], "v bigint")
    b = spark.createDataFrame([(v,) for v in range(1000, 1040)], "v bigint")
    out = {
        r["measure"]: (r["n_exact"], r["within_tol"])
        for r in theta_set_cardinalities(a, b, "v", tol_pct=10).collect()
    }
    assert out["inter"] == (0, True)  # est must be exactly 0 to pass 0-tol
    assert out["union"] == (80, True)
    assert out["diff"] == (40, True)


def _skewed_df(spark):
    # frequencies: t0:500, t1:200, t2:100, then 40 singletons
    rows = (
        [("t0",)] * 500 + [("t1",)] * 200 + [("t2",)] * 100
        + [(f"rare{i}",) for i in range(40)]
    )
    return spark.createDataFrame(rows, "tok string")


def test_sharded_topk_exact_regime_is_groupby(spark):
    df = _skewed_df(spark)
    got = sharded_top_k(
        df, "tok", F.abs(F.crc32(F.col("tok"))) % 8, k=50, max_items_tracked=100
    ).collect()
    exact = {
        r["tok"]: r["n"]
        for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["item"]: r["cnt"] for r in got} == exact
    # deterministic presentation order: count desc, item asc
    pairs = [(-r["cnt"], r["item"]) for r in got]
    assert pairs == sorted(pairs)


def test_sharded_topk_approximate_regime_recall(spark):
    """Tracked capacity below the distinct count: exact counts are no
    longer guaranteed, but items an order of magnitude heavier than
    the tail must surface in the top-k (the sketch's guarantee for
    hitters above the error floor)."""
    df = _skewed_df(spark)  # 43 distinct, track only 8 per shard
    got = sharded_top_k(
        df, "tok", F.abs(F.crc32(F.col("tok"))) % 4, k=3, max_items_tracked=8
    ).collect()
    assert [r["item"] for r in got[:3]] == ["t0", "t1", "t2"]


def test_hll_union_agg_matches_flat_sketch(spark):
    """Merge coherence: union of per-group sketches estimates the
    same value as one flat sketch over the whole column — the
    property that makes shard→corpus rollups re-scan-free."""
    df = _groups_df(spark)
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("v").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    flat = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("e")
    ).collect()[0]["e"]
    assert merged == flat


def test_distinct_state_parquet_roundtrip(spark, tmp_path):
    """The incremental-distinct story (q241) requires the binary HLL
    state to survive a parquet round trip: write the per-key state
    table, read it back, merge with a delta's state — estimates must
    equal the flat sketch over the union."""
    from patientdataintegration_spark.operators.incremental import (
        distinct_readout,
        distinct_sketch_state,
        merge_distinct_states,
    )

    df = _groups_df(spark)
    hist = df.filter("v % 2 = 0")
    delta = df.filter("v % 2 = 1")
    p = str(tmp_path / "state.parquet")
    distinct_sketch_state(hist, ["g"], "v").write.parquet(p)
    merged = merge_distinct_states(
        [spark.read.parquet(p), distinct_sketch_state(delta, ["g"], "v")],
        ["g"],
    )
    got = {
        r["g"]: r["n_distinct_est"]
        for r in distinct_readout(merged, ["g"]).collect()
    }
    flat = {
        r["g"]: r["e"]
        for r in df.groupBy("g")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("e"))
        .collect()
    }
    assert got == flat
    # and in this small regime the estimates are exact
    assert got == {"g1": 50, "g2": 30, "g3": 10}
