"""Physical-plan shape assertions (SURVEY.md §4): the plans we
designed for are the plans Catalyst actually produces. These are the
100-TB-stance tests — they fail if someone reorders a transform in a
way that adds a shuffle or breaks pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from patientdataintegration_spark.plans.inspect import (
    count_shuffles,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
)
from patientdataintegration_spark.sources.catalog import load_table
from patientdataintegration_spark.suite.core import grouped_scores, tile_scores


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    pushed = pushed_filters(df)
    assert pushed and any("l_orderkey" in p for p in pushed)


def test_column_pruning(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    schemas = scan_read_schema(df)
    assert schemas and all(
        "l_orderkey" in s and "l_extendedprice" not in s for s in schemas
    )


def test_small_dim_join_broadcasts(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    df = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    assert has_broadcast_join(df)


def test_grouped_scores_at_most_one_shuffle(spark, sf_dir):
    # join on l_orderkey + groupBy the same key: at most ONE shuffle
    # total (the agg's; at small SF the join broadcasts, at large SF
    # a shuffle join's partitioning is reused by the agg).
    g = grouped_scores(spark, sf_dir)
    assert count_shuffles(g) <= 1
    plan = explain_str(g)
    assert "SortAggregate" not in plan  # min/avg keep it hash-aggregated


def test_partial_aggregation_present(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = explain_str(df)
    # partial + final hash aggregate pairs around the exchange
    assert plan.count("HashAggregate") >= 2
