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
   The prefix sum runs as a triangular conditional aggregate over
   the tiny (pid, count) relation — P² arithmetic on P ≈ hundreds of
   partitions, broadcast back — so no unpartitioned window appears
   anywhere in the plan, not even a cosmetic one.

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
`functions.ipynb`); this module is the distributed equivalent used
by q54/q145 (NTILE/PERCENT_RANK rollups) after r7 removed their
unpartitioned windows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_MASK33 = (1 << 33) - 1


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[Column],
    rn_col: str = "rn",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """All input columns plus `rn_col` = the exact 1-based global
    row number under `order_cols` (which must be a unique total
    order), computed with range partitioning + local sort + prefix
    offsets — never an unpartitioned window. With `total_col`, also
    attaches the total row count to every row (it rides the same
    broadcast offsets relation for free, saving callers a second
    scalar-aggregate pass for NTILE/PERCENT_RANK denominators)."""
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
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
    numbered = numbered.localCheckpoint(eager=False)

    counts = numbered.groupBy("_gr_pid").agg(
        F.count(F.lit(1)).alias("_gr_cnt")
    )
    a = counts.select(
        F.col("_gr_pid").alias("_gr_pid_a"), F.col("_gr_cnt").alias("_gr_cnt_a")
    )
    b = counts.select(
        F.col("_gr_pid").alias("_gr_pid_b"), F.col("_gr_cnt").alias("_gr_cnt_b")
    )
    offsets = (
        a.crossJoin(b)
        .groupBy("_gr_pid_a")
        .agg(
            F.sum(
                F.when(
                    F.col("_gr_pid_b") < F.col("_gr_pid_a"),
                    F.col("_gr_cnt_b"),
                ).otherwise(F.lit(0))
            ).alias("_gr_off"),
            F.sum("_gr_cnt_b").alias("_gr_total"),
        )
        .withColumnRenamed("_gr_pid_a", "_gr_pid")
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
