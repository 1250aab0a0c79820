"""Partition-layout helpers — keeping CPU-heavy map stages wide.

Spark sizes scan partitions by *bytes* (`spark.sql.files.
maxPartitionBytes`), which is right for I/O-bound scans but wrong
for compute-bound per-row stages over small-but-expensive inputs: a
2 MB parquet file of 5k documents becomes ONE task, and an
explode-heavy shingle pipeline then runs single-threaded while 31
cores idle. At 100 TB the scan naturally yields thousands of
partitions and these helpers are no-ops; at the small end they
spread the rows so per-row cost — not byte count — drives
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the current layout has fewer
    partitions than the cluster has slots.

    The repartition is a shuffle of the input rows, so it is guarded:
    on a real cluster reading real data volumes the input partition
    count already exceeds ``defaultParallelism`` and this returns the
    DataFrame untouched — zero added shuffle. Deterministic operators
    stay deterministic (every draw/hash in this engine derives from
    row keys, never from partition layout — functions/deterministic).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
