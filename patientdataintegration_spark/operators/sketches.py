"""Mergeable-sketch operators: Datasketches HLL / Theta cardinality
and the approx-top-k frequency sketch, exposed as rollup-friendly
aggregations.

The reference computes its distinct/frequency statistics eagerly on
one node (pandas `nunique` / `value_counts` over the collected frame
— `patient_data_integration.ipynb` metric cells); none of that
survives 100 TB. The Spark-first shape is a MERGEABLE SKETCH: each
partition builds kilobytes of state, the state unions associatively
to any coarser grain (shard → table → day → corpus) with no re-scan,
and the estimate carries a published error bound. Spark 4 ships the
Apache DataSketches implementations as built-in JVM aggregates
(`hll_sketch_agg`, `theta_sketch_agg`, `approx_top_k_accumulate` ...)
— everything here stays inside whole-stage codegen; no UDFs.

Why three sketches:
- HLL: distinct counts per group + union rollups (smallest state).
- Theta: distinct counts under SET ALGEBRA — union/intersection/
  difference across corpora (HLL cannot intersect), the shape of
  "how many customers did 1994 and 1995 share" at corpus scale.
- approx_top_k: heavy hitters; below `max_items_tracked` distinct
  values the sketch is EXACT, so the same plan serves as an exact
  GROUP-BY replacement with bounded state.

Determinism: every sketch here hashes values with a fixed seed and
its merge is order/partitioning-independent, so estimates are stable
run to run — which is what lets the suite hash-check verdict lanes
built on them (q237/q238) instead of settling for rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _within_pct(est: Column, exact: Column, pct: int) -> Column:
    """|est − exact| <= pct% of exact, in PURE INTEGER arithmetic
    (abs-difference scaled by 100 vs exact scaled by pct) — no FP
    division, so the verdict boolean is engine- and platform-exact.
    """
    return (F.abs(est - exact) * 100) <= (exact * pct)


def hll_rollup(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tol_pct: int = 10,
) -> DataFrame:
    """Per-group HLL distinct estimate + ONE-SHOT union rollup to the
    grand total, each with its exact twin and an integer-exact
    tolerance verdict.

    The rollup row is the point: `hll_union_agg` merges the per-group
    sketches WITHOUT touching the fact table again — the 100 TB
    pattern where per-partition sketches land in a tiny state table
    and every coarser grain is a metadata-sized re-aggregation. The
    exact twins (count_distinct) are computed alongside at test scale
    to grade the estimate; a production pipeline drops them.

    Output: (grain, bucket, n_exact, within_tol) — grain ∈
    {'group', 'all'}; estimates are not emitted raw (they are
    deterministic but engine-specific), only the verdict is, which
    keeps the relation fully hash-checkable against a portable SQL
    oracle.
    """
    per_group = df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col).alias("sk"),
        F.count_distinct(value_col).cast("bigint").alias("n_exact"),
    )
    group_rows = per_group.select(
        F.lit("group").alias("grain"),
        F.col(group_col).cast("string").alias("bucket"),
        "n_exact",
        _within_pct(
            F.hll_sketch_estimate("sk"), F.col("n_exact"), tol_pct
        ).alias("within_tol"),
    )
    # grand total: sketches union with no re-scan; the exact twin
    # must re-aggregate the fact (distinct does not decompose).
    total_sketch = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_all")
    )
    total_exact = df.agg(
        F.count_distinct(value_col).cast("bigint").alias("n_exact")
    )
    all_row = total_exact.crossJoin(F.broadcast(total_sketch)).select(
        F.lit("all").alias("grain"),
        F.lit("ALL").alias("bucket"),
        "n_exact",
        _within_pct(F.col("est_all"), F.col("n_exact"), tol_pct).alias(
            "within_tol"
        ),
    )
    return group_rows.unionByName(all_row)


def theta_set_cardinalities(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    tol_pct: int = 10,
) -> DataFrame:
    """Distinct-set algebra via Theta sketches: |A|, |B|, |A∪B|,
    |A∩B|, |A\\B| estimated from TWO single-pass sketches, verdicted
    against their exact twins.

    Theta is the sketch HLL can't be: union/intersection/difference
    compose on the sketch state itself, so cross-corpus overlap
    questions ("how much of corpus B is already in A?" — the
    decontamination cardinality) cost two scans total, not a join.
    Exact twins use a full-outer membership join at test scale.

    Output: one row per measure (measure, n_exact, within_tol).
    """
    sk_a = left.agg(F.theta_sketch_agg(value_col).alias("s"))
    sk_b = right.agg(F.theta_sketch_agg(value_col).alias("t"))
    la = left.select(F.col(value_col).alias("v")).distinct()
    rb = right.select(F.col(value_col).alias("v")).distinct()
    exact = (
        la.withColumn("in_a", F.lit(1))
        .join(rb.withColumn("in_b", F.lit(1)), "v", "full_outer")
        .agg(
            F.coalesce(F.sum("in_a"), F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce(F.sum("in_b"), F.lit(0)).cast("bigint").alias("n_b"),
            F.count(F.lit(1)).cast("bigint").alias("n_union"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_inter"),
            F.coalesce(
                F.sum(
                    F.when(F.col("in_a").isNotNull() & F.col("in_b").isNull(), 1)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_diff"),
        )
    )
    # ONE single-row plan: exact × sketch_A × sketch_B (each broadcast
    # side a bare one-row aggregate — the sanctioned scalar shape),
    # estimates + verdicts as columns, then a stack() unpivot to the
    # 5-measure relation. No branch recomputes the inputs.
    one = exact.crossJoin(F.broadcast(sk_a)).crossJoin(F.broadcast(sk_b))
    est = {
        "a": F.theta_sketch_estimate("s"),
        "b": F.theta_sketch_estimate("t"),
        "union": F.theta_sketch_estimate(F.theta_union("s", "t")),
        "inter": F.theta_sketch_estimate(F.theta_intersection("s", "t")),
        "diff": F.theta_sketch_estimate(F.theta_difference("s", "t")),
    }
    verdicts = one.select(
        "n_a",
        "n_b",
        "n_union",
        "n_inter",
        "n_diff",
        *[
            _within_pct(
                F.round(e).cast("bigint"), F.col(f"n_{m}"), tol_pct
            ).alias(f"ok_{m}")
            for m, e in est.items()
        ],
    )
    return verdicts.selectExpr(
        "stack(5, 'a', n_a, ok_a, 'b', n_b, ok_b, 'union', n_union, ok_union, "
        "'inter', n_inter, ok_inter, 'diff', n_diff, ok_diff) "
        "AS (measure, n_exact, within_tol)"
    )


def sharded_top_k(
    df: DataFrame,
    value_col: str,
    shard_col: Column,
    k: int,
    max_items_tracked: int,
) -> DataFrame:
    """Heavy hitters via the DISTRIBUTED approx_top_k protocol:
    per-shard `approx_top_k_accumulate` state, `approx_top_k_combine`
    merge, `approx_top_k_estimate` extraction — the mergeable
    tree-reduce shape (shard sketches are bounded state; the combine
    is associative, so any rollup topology works at 100 TB).

    Below `max_items_tracked` distinct values the sketch tracks every
    item, making counts EXACT — the regime the oracle-checked lane
    runs in (the approximate regime is pytest-bounded instead:
    recall of sufficiently-heavy hitters is guaranteed, rank order of
    near-ties is not). The estimate array's internal tie order is
    unspecified, so the result is exploded and re-sorted into a
    deterministic (count DESC, item ASC) relation.
    """
    # SQL-registry spellings: the approx_top_k state functions are
    # not yet surfaced as pyspark.sql.functions wrappers in 4.1
    per_shard = df.groupBy(shard_col.alias("shard")).agg(
        F.expr(
            f"approx_top_k_accumulate({value_col}, {max_items_tracked})"
        ).alias("state")
    )
    combined = per_shard.agg(
        F.expr(
            f"approx_top_k_estimate("
            f"approx_top_k_combine(state, {max_items_tracked}), {k})"
        ).alias("top")
    )
    return (
        combined.select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").cast("string").alias("item"),
            F.col("e.count").cast("bigint").alias("cnt"),
        )
        .orderBy(F.col("cnt").desc(), F.col("item").asc())
    )
