"""Distributed table integrity fingerprints — compare two copies of
a 100 TB table WITHOUT moving either.

The ops problem (migration validation, replica anti-entropy, CDC
audit): after copying/compacting/re-partitioning a huge table, prove
the content is identical. Row-by-row comparison means shipping the
data again; this operator reduces each shard to a (row count,
content checksum) pair — kilobytes — that two clusters compute
independently and diff.

Design for exactness AND mergeability:

- per-row fingerprint: `conv(substr(md5(canonical_row), 1, 16), 16,
  10)` — the first 64 bits of the row's MD5 as an exact integer.
  MD5 is engine-portable (Spark, DuckDB, Postgres, ... all agree on
  the hex digest), unlike engine-native hashes (xxhash64 is Spark-
  specific, `hash()` is DuckDB-specific);
- shard checksum: SUM of row fingerprints as DECIMAL(38,0) — decimal
  addition is exact and ORDER-INDEPENDENT, so the checksum is
  invariant to partitioning, task scheduling, and row order: the
  properties a cross-cluster comparison needs. Headroom: 64-bit
  fingerprints sum to < 2^64 * n; DECIMAL(38,0) (~2^126) holds n up
  to ~4.6e18 rows per shard;
- mergeable: shard checksums SUM to coarser rollups (region -> table)
  with no re-scan, the same way the counts do — so one scan serves
  every granularity of the comparison;
- canonical row string: columns joined with a separator AFTER
  casting to engine-portable string forms (ints, strings, dates —
  NOT raw doubles, whose text form is engine-specific; callers
  quantize floats first, e.g. CAST(x AS DECIMAL(18,4))). NULL is
  encoded explicitly so (NULL, "a") and ("a", NULL) differ.

Collision stance: MD5's 64-bit prefix gives a ~2^-64 per-pair
collision chance; summing keeps corruption detection probabilistic
in the same way rsync/scrub checksums are — a deliberate trade for
order-independence and mergeability.

One scan, one map-side-combined aggregate, output rows = shards:
the plan a 1000-executor cluster wants.

Reference parity: the reference pipeline has no distributed
analogue (single-node pandas frames are compared in memory,
PatientDataIntegration `patient_data_integration.ipynb`); this is
part of the mandated large-scale-pipeline extension surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_NULL_TOKEN = "\x00null\x00"  # NUL-framed: cannot appear in real column text
_SEP = "\x1f"  # ASCII unit separator: one UTF-8 byte in both engines


def canonical_row(cols: Sequence[str | Column]) -> Column:
    """The engine-portable serialization of a row: each column cast
    to string, NULLs made explicit, joined with a non-printing
    separator (so ("ab","c") differs from ("a","bc"))."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit(_NULL_TOKEN),
        )
        for c in cols
    ]
    return F.concat_ws(_SEP, *parts)


def row_fingerprint(cols: Sequence[str | Column]) -> Column:
    """First 64 bits of the row MD5 as an exact DECIMAL(38,0)."""
    return F.conv(F.substring(F.md5(canonical_row(cols)), 1, 16), 16, 10).cast(
        "decimal(38,0)"
    )


def shard_checksum(
    df: DataFrame,
    cols: Sequence[str | Column],
    shard_expr: Column,
    shard_col: str = "shard",
) -> DataFrame:
    """Per-shard (row count, order-independent content checksum) over
    the canonical serialization of `cols`. Two copies of a table
    agree iff every shard's (n_rows, checksum) pair agrees — the
    shard granularity localizes a mismatch to a re-checkable slice
    instead of a 100 TB "somewhere"."""
    return (
        df.select(
            shard_expr.cast("int").alias(shard_col),
            row_fingerprint(cols).alias("_fp"),
        )
        .groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_fp").alias("checksum"),
        )
    )
