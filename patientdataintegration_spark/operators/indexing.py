"""Global row numbering without a single-reducer sort.

`row_number() OVER (ORDER BY ...)` funnels every row through one
task — fine for 10-row reports (q54), fatal at 100 TB. The scalable
spelling: range-partition by the ordering key (sampled split points,
Spark's native `repartitionByRange`), number rows within each
partition, then add the exclusive prefix-sum of partition sizes —
the sizes (one long per partition) are the ONLY data that touches
the driver. The reference's implicit pandas row index
(`functions_v2.py` passim) is this operator's motivation: every
"idx"-keyed structure needs an explicit deterministic key in a
distributed engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_row_ids(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign 0-based dense global row ids in `order_cols` order
    (which must be a total order — add a tiebreaker column if not).

    Three steps, no global sort: (1) repartitionByRange on the keys
    — partition i holds keys strictly below partition i+1's; (2)
    sortWithinPartitions + per-partition row_number (each task
    numbers only its own rows); (3) join the broadcast exclusive
    prefix-sum of partition counts. Cost: the range shuffle + a
    count job; the window never crosses partitions.
    """
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    ranged = ranged.sortWithinPartitions(*cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = ranged.withColumn("_local", F.row_number().over(w))
    sizes = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = sizes.select(
        "_pid",
        (
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("_offset"),
    ).fillna(0, subset=["_offset"])
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_local") - 1).cast("bigint"))
        .drop("_pid", "_local", "_offset")
    )
