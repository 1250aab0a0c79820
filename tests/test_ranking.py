"""`operators/ranking` — distributed global row numbers must be
bit-identical to the single-reducer unpartitioned window they
replace (q54/q145's r7 rewrite), including the NTILE bucket-size
arithmetic's remainder edge cases."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from tests.conftest import SF_DIR


def _window_reference(df, order_cols):
    w = Window.orderBy(*order_cols)
    return df.withColumn("rn_ref", F.row_number().over(w))


def test_global_row_number_matches_window(spark):
    """On the real customer table, under both ASC and DESC unique
    orders, every row's distributed rank equals the window rank."""
    from patientdataintegration_spark.operators.ranking import (
        global_row_number,
    )
    from patientdataintegration_spark.sources.catalog import load_table

    c = load_table(spark, SF_DIR, "customer").select("c_acctbal", "c_custkey")
    for order in (
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        [F.col("c_acctbal").asc(), F.col("c_custkey").desc()],
    ):
        got = global_row_number(c, order, rn_col="rn", total_col="n_total")
        joined = got.join(_window_reference(c, order), ["c_acctbal", "c_custkey"])
        n = c.count()
        assert joined.filter(F.col("rn") != F.col("rn_ref")).count() == 0
        assert joined.count() == n
        assert got.agg(F.min("n_total"), F.max("n_total")).collect()[0] == (n, n)
        # ranks are a permutation of 1..n
        assert got.agg(
            F.min("rn"), F.max("rn"), F.count_distinct("rn")
        ).collect()[0] == (1, n, n)


def test_global_row_number_more_partitions_than_rows(spark):
    """Range partitioning with (far) more partitions than rows must
    still produce consecutive ranks — empty partitions contribute
    zero to the prefix offsets."""
    from patientdataintegration_spark.operators.ranking import (
        global_row_number,
    )

    df = spark.createDataFrame([(v,) for v in (5, 3, 9, 1)], "k int")
    rows = (
        global_row_number(df, [F.col("k").asc()], num_partitions=16)
        .orderBy("rn")
        .collect()
    )
    assert [(r.k, r.rn) for r in rows] == [(1, 1), (3, 2), (5, 3), (9, 4)]


def test_ntile_from_rank_matches_window_ntile(spark):
    """NTILE arithmetic vs the window function for every
    (total, buckets) shape in a grid that covers rem == 0,
    rem != 0, and total < buckets."""
    from patientdataintegration_spark.operators.ranking import (
        ntile_from_rank,
    )

    for total in (1, 3, 7, 8, 16, 23):
        for buckets in (2, 4, 8, 10):
            df = spark.createDataFrame([(i,) for i in range(1, total + 1)], "k int")
            w = Window.orderBy("k")
            ref = df.select(
                "k", F.ntile(buckets).over(w).alias("ref_bucket")
            )
            got = df.select(
                "k",
                ntile_from_rank(
                    F.col("k").cast("bigint"), F.lit(total).cast("bigint"), buckets
                ).alias("bucket"),
            )
            bad = (
                got.join(ref, "k")
                .filter(F.col("bucket") != F.col("ref_bucket"))
                .count()
            )
            assert bad == 0, f"ntile mismatch at total={total} buckets={buckets}"


def test_q54_q145_windows_only_over_counts_relation(spark):
    """The r7 point, refined in r11: the exact NTILE/PERCENT_RANK
    rollups never funnel the FACT TABLE through an unpartitioned
    WindowExec. The r11 O(P) prefix sum does plan a window, but only
    over the metadata-sized (pid, count) relation — every Window node
    in the plan must order on `_gr_pid`, proving its input is the
    P-row counts aggregate and not the ranked data."""
    from patientdataintegration_spark.suite.core import q54_spend_deciles
    from patientdataintegration_spark.suite.ext2 import (
        q145_equidepth_histogram,
    )

    for q in (q54_spend_deciles, q145_equidepth_histogram):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        win_lines = [
            ln for ln in plan.splitlines() if "Window" in ln
        ]
        for ln in win_lines:
            assert "_gr_pid" in ln, (
                f"{q.__name__} plans a Window NOT over the counts"
                f" relation: {ln.strip()}"
            )


def test_global_row_number_partition_overflow_guard(spark, monkeypatch):
    """The 2^33-rows-per-partition bound (local index bits of
    monotonically_increasing_id) must fail LOUD, not corrupt ranks
    silently: shrink the module bound and force everything into one
    partition — the counts aggregate's guard raises."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from patientdataintegration_spark.operators import ranking

    df = spark.range(10).select(F.col("id").alias("k"))
    monkeypatch.setattr(ranking, "_MAX_PART_ROWS", 4)
    out = ranking.global_row_number(df, [F.col("k").asc()], num_partitions=1)
    with pytest.raises(SparkRuntimeException, match="2\\^33"):
        out.collect()


def test_adaptive_partitions_scale_with_input(spark):
    """num_partitions=None sizes range partitions off the Catalyst
    byte estimate: tiny inputs get few partitions (the r7 q145
    constant-factor lesson), and the count is capped by
    spark.sql.shuffle.partitions — the knob a 100 TB deployment
    sizes — so huge estimates cannot explode the partitioning."""
    from patientdataintegration_spark.operators.ranking import (
        _TARGET_BYTES,
        _adaptive_num_partitions,
    )
    from patientdataintegration_spark.sources.catalog import load_table

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    c = load_table(spark, SF_DIR, "customer").select("c_acctbal", "c_custkey")
    n_small = _adaptive_num_partitions(c)
    assert 1 <= n_small <= cap
    size = int(c._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert n_small == max(1, min(cap, -(-size // _TARGET_BYTES)))


def test_approx_equidepth_verdict_tie_degenerate(spark):
    """The r7 ADVICE case: heavily tied columns make percentile_approx
    return duplicate edges — the verdict must degrade gracefully
    (conservation + monotonicity stay hard, the count band is waived)
    instead of reddening on honest sketch output."""
    from patientdataintegration_spark.operators.ranking import (
        approx_equidepth_verdict,
    )

    # all-equal column: every decile edge is the same value
    const = spark.range(500).select(F.lit(7.25).alias("v"))
    r = approx_equidepth_verdict(const, "v", 10, "sum_v").collect()[0]
    assert r.n_total == 500 and r.edges_monotone and r.balanced
    assert r.sum_v == 500 * 7.25

    # two-value 80/20 split: edges collapse to two distinct values,
    # the upper one equal to the max (legitimately empty last bucket)
    two = spark.range(1000).select(
        F.when(F.col("id") % 5 == 0, 9.0).otherwise(1.0).alias("v")
    )
    r = approx_equidepth_verdict(two, "v", 10, "sum_v").collect()[0]
    assert r.n_total == 1000 and r.edges_monotone and r.balanced

    # tie-free uniform data: the strict count band applies and holds
    uni = spark.range(10000).select((F.col("id") * 1.0).alias("v"))
    r = approx_equidepth_verdict(uni, "v", 10, "sum_v").collect()[0]
    assert r.n_total == 10000 and r.edges_monotone and r.balanced
