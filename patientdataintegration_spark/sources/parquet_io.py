"""Partitioned parquet sink + pruned scan (the engine's primary
at-scale storage lane; the reference's only sinks are a CSV fold
table and torch model blobs — `functions_v2.py:132-138,382-387` —
so this is the north-star replacement for both).

Scale design:

- **Partition layout = coarse index.** `partitionBy(col)` turns every
  equality/range predicate on the partition column into directory
  pruning — a 100 TB table filtered to one day reads one directory,
  and the pruning happens in the driver before any task launches
  (`PartitionFilters` in the scan node, visible in `.explain`).
- **Small-files control.** A naive `partitionBy` write emits
  (input partitions × distinct keys) files; at 32 shuffle partitions
  and 7 years that is 224 files for a tiny table. Repartitioning BY
  THE PARTITION COLUMNS first routes each key's rows to one task →
  one file per key (plus optional `files_per_key` salting for keys
  too large for a single task's output).
- **Stats-based skipping rides along.** Parquet row-group min/max on
  the remaining columns serve predicates the directory layout
  doesn't cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_key: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write `df` as hive-layout parquet partitioned on
    `partition_cols`, producing `files_per_key` files per partition
    directory.

    `repartition(partition_cols)` before the write is the critical
    step: it makes file count independent of the upstream partition
    count. For a key whose volume exceeds one task (skewed daily
    partitions at 100 TB), raise `files_per_key` — rows are salted
    across that many tasks per key.
    """
    keys = [F.col(c) for c in partition_cols]
    if files_per_key > 1:
        salt = (F.crc32(F.concat_ws("\x1f", *[c.cast("string") for c in keys])) % files_per_key)
        part = df.repartition(*keys, salt.alias("_salt"))
    else:
        part = df.repartition(*keys)
    part.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_pruned(
    spark: SparkSession, path: str, **partition_filters: object
) -> DataFrame:
    """Read a partitioned parquet table with equality filters on the
    partition columns applied immediately — so the filters land in
    the scan's `PartitionFilters` and non-matching directories are
    never listed into tasks."""
    df = spark.read.parquet(path)
    for col, val in partition_filters.items():
        df = df.filter(F.col(col) == F.lit(val))
    return df


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ~`target_file_mb`-sized files
    (the maintenance job every long-lived table needs: streaming and
    per-key writes accumulate small files, and at 100 TB the
    listing + open overhead of millions of 1 MB files dominates scan
    time). Returns the number of output files."""
    df = spark.read.parquet(path)
    # One scalar aggregate, not a row-per-file collect: at 100 TB a
    # small-file-riddled table lists MILLIONS of files, and pulling a
    # row per file to the driver is exactly the anti-pattern this
    # maintenance job exists to fix (r10 ADVICE item 5).
    total_bytes = int(
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .agg(F.coalesce(F.sum("length"), F.lit(0)).alias("total"))
        .first()["total"]
    )
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
