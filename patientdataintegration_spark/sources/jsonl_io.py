"""JSONL ingest / egress — the lingua franca of LLM training corpora.

The reference ingests CSV cohort tables and binary tiles
(`functions_v2.py:17`, SURVEY.md §2.1); a training-data pipeline at
100 TB additionally exchanges corpora as newline-delimited JSON
(one document object per line, usually gzip-compressed shards).
Spark's native JSON source handles this distributed — each shard
file splits by newline into tasks, schema is enforced (never
inferred in production: inference is a full extra pass over the
data), and malformed lines land in an explicit corrupt-record lane
instead of failing the job.

Scale notes:
- ALWAYS pass an explicit schema at 100 TB. `spark.read.json`
  without one scans everything once just to infer types.
- gzip shards are NOT splittable — one task per file. Corpora meant
  for Spark should be many ~100 MB-1 GB shards (or zstd parquet);
  `write_jsonl(n_files=...)` sizes the output shard count.
- The corrupt-record column is populated only when a row fails to
  parse; filtering on it requires the parsed columns to be
  materialized first (Spark refuses `filter` on the corrupt column
  of a freshly-read frame), hence the `.cache()` in `bad_lines`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    n_files: int | None = None,
    compression: str | None = None,
) -> str:
    """Write a DataFrame as JSONL shards under `path`.

    `n_files` coalesces (no shuffle) to bound the shard count —
    size shards to ~100 MB-1 GB so a later distributed read
    parallelizes; `compression` may be 'gzip'/'zstd' etc. (trade
    splittability for bytes)."""
    w = df.coalesce(n_files) if n_files else df
    writer = w.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    return path


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-enforced PERMISSIVE JSONL read.

    Malformed lines yield nulls for every data column; with
    `keep_corrupt=True` the raw line is preserved in
    `_corrupt_record` for a quarantine sink."""
    s = schema
    if keep_corrupt and CORRUPT_COL not in s.fieldNames():
        s = s.add(CORRUPT_COL, StringType())
    return (
        spark.read.schema(s)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def bad_lines(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """The quarantine lane: raw text of every line that failed to
    parse under `schema`. Cached before the corrupt-column filter
    (Spark disallows referencing only the corrupt column of an
    un-materialized JSON scan)."""
    df = read_jsonl(spark, path, schema, keep_corrupt=True).cache()
    return df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
