"""Bucketed tables: pay the join shuffle once, at write time.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle
of both sides. Bucketing moves that exchange to WRITE time: each
table is hash-clustered into `n_buckets` files on the join key
(bucket id = `pmod(murmur3(key), n)` — the same formula
`repartition(n, key)` uses), and the layout is recorded in the table
catalog. Every later join or aggregation on that key between tables
with compatible bucketing reads co-located buckets directly: the
`Exchange` node disappears from the physical plan entirely
(`tests/test_plans.py` pins this), and the one-time write cost is
amortized over every downstream query on the key.

The reference re-reads its slide table per experiment run
(`run_experiments.py` loop) with no layout control; this is the
Spark-native replacement for that repeated full-shuffle pattern.

Scale notes:

- `repartition(n_buckets, keys)` before the write makes each task
  hold exactly one bucket's rows (identical hash formula), so the
  table lands as ONE file per bucket instead of tasks x buckets
  small files.
- `sortBy` within buckets additionally gives parquet row-group
  min/max locality on the key, serving point lookups without a
  full bucket read.
- Bucket count is a layout contract: both join sides must share it
  (or one must be a multiple under AQE's bucket coalescing). Choose
  it from target bucket SIZE (e.g. total_bytes / 256 MB), not from
  cluster width.
- Tables are registered in the session catalog with an explicit
  external `path`, so nothing depends on the session's warehouse
  dir (the driver runs a vanilla session from an arbitrary CWD).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed parquet table registered as `name`
    in the session catalog, with data files at the external `path`.

    One shuffle (the write-time clustering) — the shuffle this
    table's future joins will never pay again.
    """
    part = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    writer = (
        part.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: Sequence[str] | list,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables. With matching bucket
    specs the plan is a sort-merge join with ZERO Exchange on either
    side — verify with `df.explain()`; `tests/test_plans.py` pins it.
    """
    return spark.table(left_name).join(spark.table(right_name), on=list(on), how=how)
