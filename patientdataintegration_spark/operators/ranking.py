"""Distributed exact global ranking — the scale-out replacement for
the single-reducer unpartitioned window.

`Window.orderBy(...)` with no PARTITION BY funnels the whole table
through ONE task (Spark logs `WindowExec: No Partition Defined`); at
100 TB that is a non-starter. But exact global row numbers do not
need a global funnel — they decompose over any *range* partitioning:

1. `repartitionByRange(keys)` splits the total order into disjoint,
   contiguous key ranges (partition i holds strictly smaller keys
   than partition i+1 — every parallel sort since TeraSort works
   this way);
2. `sortWithinPartitions(keys)` orders each range locally — Spark's
   fully parallel external sort;
3. `monotonically_increasing_id()` then encodes (partition id, local
   row index) as `pid << 33 | idx` — the local index is consecutive
   from 0 in on-disk order, so `mid & (2^33-1)` + 1 IS the
   within-partition row number, with no window operator and no
   additional shuffle;
4. per-partition row counts (a metadata-sized aggregate) turn local
   row numbers into global ones: `rn = prefix_offset(pid) + local`.
   The prefix sum is a running-sum window over the tiny (pid, count)
   relation — O(P) work on P rows where P is the partition count
   (tens of thousands at most, bounded by shuffle.partitions), then
   broadcast back. The ONLY window in the plan therefore runs over a
   metadata-sized relation, never the fact table: the single task it
   funnels through sorts P rows, not 100 TB. (r11 replaced the
   previous triangular crossJoin spelling — O(P²) arithmetic — with
   this O(P) form; identical ranks by construction.)

The ranged+numbered relation has two plan consumers (the counts
aggregate and the final offset join), so it is localCheckpoint-ed
once — the engine's standard multi-consumer discipline (DataFrame
DAG branches re-execute their upstream otherwise; see
`plans/materialize.py`). At cluster scale the checkpoint is one
materialization of data that was just shuffled anyway; the
single-reducer alternative is one task sorting 100 TB.

Determinism contract: `order_cols` must define a UNIQUE total order
(tiebreak on a key column) — the same requirement every oracle-
checked windowed query in the suite already obeys. Given that, the
assigned numbers are a pure function of the data: range boundaries
only decide WHERE a row is ranked, not its rank.

Reference parity: the reference's notebook ranks cohorts with pandas
`rank()`/`qcut` on a single node (PatientDataIntegration
`patient_data_integration.ipynb`); this module is the distributed
equivalent used by q54/q145 (NTILE/PERCENT_RANK rollups) after r7
removed their unpartitioned windows.

Partition-count safety: the local row index lives in the LOW 33 bits
of `monotonically_increasing_id`, so a range partition may hold at
most 2^33 rows — beyond that the index bleeds into the partition-id
bits and ranks would corrupt SILENTLY. The counts aggregate (already
computed for the prefix offsets) therefore asserts the bound at
runtime and fails the job with an explicit message instead. With the
r8 adaptive default (`num_partitions=None` sizes partitions off the
optimizer's byte estimate, ~_TARGET_BYTES each, capped at
`spark.sql.shuffle.partitions`) a partition approaches 2^33 rows only
if the shuffle-partition cap is badly undersized for the input — the
exact misconfiguration the guard is for.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_MASK33 = (1 << 33) - 1

# Hard per-partition row bound: local indices occupy the low 33 bits
# of monotonically_increasing_id. Module-level so the overflow test
# can shrink it and exercise the runtime guard without 2^33 rows.
_MAX_PART_ROWS = 1 << 33

# Adaptive range-partition sizing target. 64 MiB of (pruned,
# optimizer-estimated) input per sort partition keeps the local sorts
# in-memory-ish at any scale; the count is capped by
# spark.sql.shuffle.partitions, which a 1000-executor deployment
# sizes in the tens of thousands — so at 100 TB the cap governs, and
# at bench scale a handful of partitions avoids paying 32 task
# launches + a 32x32 prefix sum to rank half a million rows (the r7
# q145 regression: fixed 32 partitions cost +135% at sf0.1).
_TARGET_BYTES = 64 << 20


def _adaptive_num_partitions(df: DataFrame) -> int:
    """Range-partition count from the Catalyst size estimate:
    ceil(sizeInBytes / 64 MiB), clamped to [1, shuffle.partitions].
    Falls back to the shuffle-partition conf when the estimate is
    unavailable (e.g. no stats through this plan shape)."""
    try:
        cap = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    except Exception:
        # a non-integer conf value (e.g. "auto" under some resource
        # managers) or a conf-access error must degrade to a sane
        # fixed count, not fail the query
        cap = 32
    try:
        size = int(
            df._jdf.queryExecution()  # type: ignore[attr-defined]
            .optimizedPlan()
            .stats()
            .sizeInBytes()
        )
    except Exception:
        return cap
    if size <= 0:
        return cap
    return max(1, min(cap, -(-size // _TARGET_BYTES)))


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[Column],
    rn_col: str = "rn",
    total_col: str | None = None,
    num_partitions: int | None = None,
    checkpoint: bool | None = None,
) -> DataFrame:
    """All input columns plus `rn_col` = the exact 1-based global
    row number under `order_cols` (which must be a unique total
    order), computed with range partitioning + local sort + prefix
    offsets — never an unpartitioned window. With `total_col`, also
    attaches the total row count to every row (it rides the same
    broadcast offsets relation for free, saving callers a second
    scalar-aggregate pass for NTILE/PERCENT_RANK denominators).

    `num_partitions=None` (the default) sizes the range partitioning
    adaptively from the optimizer's byte estimate (see module
    docstring); pass an explicit count to override.

    `checkpoint=None` reads conf `spark.pdi.ranking.checkpoint`
    (default true). False skips the localCheckpoint, used by
    plan-shape tests that need to see through to the scan.
    WARNING — with the checkpoint off, correctness RIDES ON
    exchange reuse: the counts branch and the join-back branch each
    plan their own range exchange, and if Spark did NOT deduplicate
    them (ReuseExchange/AQE stage caching), the two exchanges would
    sample range boundaries independently (the sample seed includes
    the RDD id), the per-partition counts would describe a different
    partitioning than the one the final ranks use, and ranks would
    corrupt SILENTLY. Reuse does fire for this shape (identical
    canonicalized subtrees — both consumers read the full `numbered`
    relation), but the default keeps the checkpoint because
    "correct unless a physical-planning rule declines" is not a
    production contract."""
    spark = df.sparkSession
    n_parts = num_partitions or _adaptive_num_partitions(df)
    if checkpoint is None:
        checkpoint = (
            str(
                spark.conf.get("spark.pdi.ranking.checkpoint", "true")
            ).lower()
            == "true"
        )
    cols = list(order_cols)
    numbered = (
        df.repartitionByRange(n_parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_gr_mid", F.monotonically_increasing_id())
        .withColumn(
            "_gr_pid", F.shiftright(F.col("_gr_mid"), 33).cast("int")
        )
        .withColumn(
            "_gr_lrn", F.col("_gr_mid").bitwiseAND(F.lit(_MASK33)) + F.lit(1)
        )
        .drop("_gr_mid")
    )
    # Two consumers below (counts + join-back): materialize once.
    if checkpoint:
        numbered = numbered.localCheckpoint(eager=False)

    counts = numbered.groupBy("_gr_pid").agg(
        F.count(F.lit(1)).alias("_gr_cnt")
    )
    # 2^33 row-per-partition bound (see module docstring): fail loud
    # instead of silently corrupting ranks. The check rides the
    # already-computed counts relation — zero extra passes.
    counts = counts.withColumn(
        "_gr_cnt",
        F.when(
            F.col("_gr_cnt") <= F.lit(_MAX_PART_ROWS), F.col("_gr_cnt")
        ).otherwise(
            F.raise_error(
                F.lit(
                    "global_row_number: a range partition holds more than"
                    " 2^33 rows — the local index would overflow into the"
                    " partition-id bits; raise num_partitions (or"
                    " spark.sql.shuffle.partitions)"
                )
            ).cast("bigint")
        ),
    )
    # O(P) prefix sum over the P-row counts relation (P = range
    # partition count, <= shuffle.partitions). This window IS
    # unpartitioned, but its input is metadata-sized — one task
    # sorting P rows, not the fact table (see module docstring;
    # replaced the r7-r10 O(P^2) triangular crossJoin).
    from pyspark.sql import Window

    w_order = Window.orderBy("_gr_pid")
    offsets = counts.select(
        "_gr_pid",
        F.coalesce(
            F.sum("_gr_cnt").over(
                w_order.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_gr_off"),
        F.sum("_gr_cnt")
        .over(
            w_order.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("_gr_total"),
    )

    out = (
        numbered.join(F.broadcast(offsets), "_gr_pid")
        .withColumn(
            rn_col, (F.col("_gr_off") + F.col("_gr_lrn")).cast("bigint")
        )
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_gr_total").cast("bigint"))
    return out.drop("_gr_pid", "_gr_lrn", "_gr_off", "_gr_total")


def approx_equidepth_verdict(
    df: DataFrame,
    value_col: str,
    buckets: int,
    sum_alias: str,
    accuracy: int = 10000,
) -> DataFrame:
    """The sketch tier of equi-depth bucketing (q232/q233's shared
    body): one `percentile_approx` pass computes the bucket edges as
    a mergeable Greenwald-Khanna sketch, the edges broadcast, and
    bucketing is a map-side array scan — no global sort, no second
    shuffle of the fact table. Returns ONE row of cross-engine-stable
    invariants instead of the engine-specific edge values:

    - `n_total` (BIGINT): exact row conservation — every row lands in
      exactly one bucket; hash-compared to the oracle's COUNT(*), so
      dropped/duplicated rows redden the gate unconditionally;
    - `<sum_alias>` (DOUBLE): the exact DECIMAL(18,6) total riding
      through the per-bucket sums (order-independent);
    - `edges_monotone`: the raw sketch output is sorted;
    - `balanced`: bucketing runs against the DEDUPLICATED edge array
      (duplicate edges on a heavily tied column would otherwise
      create a structurally empty bucket and redden the gate on
      honest sketch output — the r7 ADVICE case). Non-empty bucket
      count is bounded by n_distinct_edges + 1 (the last bucket may
      be legitimately empty when the top edge IS the max), and the
      per-bucket count band (n/buckets ± (0.02 n + 10), ~200x the
      sketch's guaranteed rank error of n/accuracy) applies only in
      the duplicate-free case where n/buckets is the right
      expectation — so a broken sketch or bucketing expression goes
      red, tie-degenerate distributions degrade gracefully to the
      conservation + monotonicity invariants.
    """
    qs = [i / buckets for i in range(1, buckets)]
    edges = df.agg(
        F.percentile_approx(value_col, qs, accuracy).alias("edges_raw")
    ).select("edges_raw", F.array_distinct("edges_raw").alias("edges"))
    bucketed = df.crossJoin(F.broadcast(edges.select("edges"))).select(
        F.col(value_col),
        (
            F.size(F.filter("edges", lambda e: F.col(value_col) > e)) + 1
        ).alias("bucket"),
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sv"),
    )
    agg = per_bucket.agg(
        F.sum("cnt").cast("bigint").alias("n_total"),
        F.sum("sv").cast("double").alias(sum_alias),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("cnt").alias("max_cnt"),
        F.min("cnt").alias("min_cnt"),
    )
    mono = edges.select(
        (F.array_sort("edges_raw") == F.col("edges_raw")).alias(
            "edges_monotone"
        ),
        F.size("edges").alias("n_edges_d"),
    )
    tol = F.col("n_total") * 0.02 + 10
    return agg.crossJoin(F.broadcast(mono)).select(
        "n_total",
        sum_alias,
        "edges_monotone",
        (
            (F.col("n_buckets") <= F.col("n_edges_d") + 1)
            & (
                (F.col("n_edges_d") < buckets - 1)
                | (
                    (F.col("max_cnt") <= F.col("n_total") / buckets + tol)
                    & (F.col("min_cnt") >= F.col("n_total") / buckets - tol)
                )
            )
        ).alias("balanced"),
    )


def ntile_from_rank(rn: Column, total: Column, buckets: int) -> Column:
    """ANSI NTILE(buckets) as pure arithmetic over (global row
    number, total count) — the distributed spelling of the NTILE
    window function. Standard semantics: the first `total % buckets`
    buckets get `total div buckets + 1` rows, the rest get
    `total div buckets`. Exact integer arithmetic, engine-portable."""
    size = F.floor(total / buckets)
    rem = total % buckets
    big = size + 1  # rows in each of the first `rem` buckets
    boundary = rem * big  # ranks 1..boundary fall in the big buckets
    return (
        F.when(rn <= boundary, F.floor((rn - 1) / big) + 1)
        .otherwise(rem + F.floor((rn - boundary - 1) / size) + 1)
        .cast("int")
    )


def percent_rank_from_rank(rn: Column, total: Column) -> Column:
    """PERCENT_RANK as (rank-1)/(total-1) — valid when the ordering
    is a unique total order (rank == row_number, the suite-wide
    discipline). Exact IEEE division, portable across engines; 0.0
    for a single-row input, matching the window function."""
    return (
        F.when(total > 1, (rn - 1) / (total - 1))
        .otherwise(F.lit(0.0))
        .cast("double")
    )
