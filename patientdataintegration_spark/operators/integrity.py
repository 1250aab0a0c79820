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


def table_checksum(df: DataFrame, cols: Sequence[str | Column]) -> DataFrame:
    """Single-row (n_rows, order-independent checksum) — the GLOBAL
    form of `shard_checksum`: a grand aggregate with no grouping key,
    so an EMPTY relation still yields its one (0, NULL) row. A
    certificate comparing two sides through this always emits its
    verdict row — `shard_checksum(..., F.lit(0))` group-by drops the
    row entirely when a side is empty, silently losing the
    matches=false it exists to report (r12 ADVICE on q274's cert).
    Compare checksums NULL-SAFELY (two empty sides agree)."""
    return df.select(row_fingerprint(cols).alias("_fp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_fp").alias("checksum"),
    )


def locate_divergence(
    a: DataFrame,
    b: DataFrame,
    cols: Sequence[str | Column],
    key_col: str,
    levels: Sequence[int] = (16, 256),
) -> DataFrame:
    """Merkle-style hierarchical divergence localization between two
    copies of a table: compare per-shard (count, checksum) pairs at
    successively finer shard granularity (key % levels[i]),
    descending ONLY into flagged shards, and finally emit the
    divergent KEYS themselves from the surviving sliver.

    Output: (level, shard, reason) — one row per flagged shard per
    level, plus one row per divergent key at level len(levels)+1
    (shard = the key). reason = 'count' when the row counts differ
    (insert/delete divergence, including a shard missing entirely on
    one side), else 'content' (same rows, different bytes).

    This is the anti-entropy shape for 100 TB replicas: when every
    level divides the next (the normal geometry), ALL levels cost ONE
    scan of each copy — the finest level's ≤ levels[-1] state rows
    are exact mergeable (count, DECIMAL-sum) pairs, so coarser levels
    re-aggregate kilobytes instead of re-scanning — plus the final
    key-level sliver scan (≤ flagged/levels[-1] of the data after
    the filter); non-nested level lists fall back to one scan per
    level over the flagged fraction. Never a row-level join of two
    full tables. The same
    q234 exactness machinery (portable MD5-prefix fingerprints,
    DECIMAL(38,0) order-independent sums) makes the levels
    cross-engine replayable; the per-pair 2^-64 collision stance is
    inherited and documented there."""
    # temp names are reserved for the duration of this call: a caller
    # column named _sh would be silently clobbered by the descent's
    # withColumn (corrupting fingerprints if it is in `cols`) — same
    # loud guard as bloom_maybe_contains/cms_query (r9 ADVICE)
    reserved = {"_sh", "_k", "_na", "_ca", "_nb", "_cb", "_fp"}
    for side, df_side in (("a", a), ("b", b)):
        clash = reserved.intersection(df_side.columns)
        if clash:
            raise ValueError(
                f"locate_divergence: {side}.columns collide with reserved "
                f"temp names {sorted(clash)}; rename them before calling"
            )
    key = F.col(key_col)
    parts: list[DataFrame] = []
    a_cur, b_cur = a, b
    nested = all(
        levels[i + 1] % levels[i] == 0 for i in range(len(levels) - 1)
    )
    if levels and nested:
        # SINGLE-PASS level rollup (guide §1.2/§2.4): the per-shard
        # state is (count, exact DECIMAL(38,0) checksum-sum) — the
        # module's own mergeability contract — so when every level
        # divides the next ((k % fine) % coarse == k % coarse for
        # truncated remainders of nested moduli), ONE finest-level
        # scan of each copy yields EVERY level by re-aggregating the
        # ≤ levels[-1] state rows. The previous spelling re-scanned
        # both full copies once per level (the descent's semi-join
        # filters rows only after the scan) and paid one sequential
        # checkpoint barrier per level; this is one scan and one
        # barrier, with the descent restriction applied EXACTLY by
        # keeping only children of flagged parents — a child shard's
        # rows within a flagged parent are identical to its rows in
        # the full table, so the flag set per level is unchanged.
        fine = levels[-1]
        cs_a = shard_checksum(a, cols, key % fine).select(
            F.col("shard"),
            F.col("n_rows").alias("_na"),
            F.col("checksum").alias("_ca"),
        )
        cs_b = shard_checksum(b, cols, key % fine).select(
            F.col("shard"),
            F.col("n_rows").alias("_nb"),
            F.col("checksum").alias("_cb"),
        )
        # one materialized job: both copies scanned once, reduced to
        # ≤ levels[-1] joined state rows (kilobytes)
        state = cs_a.join(cs_b, "shard", "full_outer").localCheckpoint()
        flagged_shards: list[int] | None = None
        for i, mod in enumerate(levels, start=1):
            # per-side rollup to this level's granularity: a side
            # absent from a coarse shard contributes no finest rows,
            # so its rolled (n, checksum) stays NULL — identical to
            # the full-outer join of per-level checksums
            lvl = state.groupBy(
                (F.col("shard") % mod).alias("_lsh")
            ).agg(
                F.sum("_na").alias("_na"),
                F.sum("_ca").alias("_ca"),
                F.sum("_nb").alias("_nb"),
                F.sum("_cb").alias("_cb"),
            )
            if flagged_shards is not None:
                # descend only into flagged parents — the original
                # adaptive restriction, applied to the state rows
                lvl = lvl.filter(
                    (F.col("_lsh") % levels[i - 2]).isin(flagged_shards)
                )
            flagged = lvl.filter(
                ~F.col("_na").eqNullSafe(F.col("_nb"))
                | ~F.col("_ca").eqNullSafe(F.col("_cb"))
            ).select(
                F.lit(i).cast("int").alias("level"),
                F.col("_lsh").cast("bigint").alias("shard"),
                F.when(~F.col("_na").eqNullSafe(F.col("_nb")), F.lit("count"))
                .otherwise(F.lit("content"))
                .alias("reason"),
            )
            # the flag set is ≤ shard-count rows of checkpointed
            # state: the collect is driver-cheap and becomes the next
            # level's literal predicate (and the sliver scan's below)
            rows = flagged.collect()
            flagged_shards = [int(r["shard"]) for r in rows]
            parts.append(
                a.sparkSession.createDataFrame(rows, flagged.schema)
            )
        # the key-level sliver: flagged finest shards imply flagged
        # parents at every level, so one IN-list on the finest modulus
        # reproduces the stacked semi-joins (empty flag set → no keys)
        sliver = (
            (key % fine).isin(flagged_shards)
            if flagged_shards
            else F.lit(False)
        )
        a_cur = a.filter(sliver)
        b_cur = b.filter(sliver)
    else:
        for i, mod in enumerate(levels, start=1):
            cs_a = shard_checksum(a_cur, cols, key % mod).select(
                F.col("shard"),
                F.col("n_rows").alias("_na"),
                F.col("checksum").alias("_ca"),
            )
            cs_b = shard_checksum(b_cur, cols, key % mod).select(
                F.col("shard"),
                F.col("n_rows").alias("_nb"),
                F.col("checksum").alias("_cb"),
            )
            j = cs_a.join(cs_b, "shard", "full_outer")
            flagged = j.filter(
                ~F.col("_na").eqNullSafe(F.col("_nb"))
                | ~F.col("_ca").eqNullSafe(F.col("_cb"))
            ).select(
                F.lit(i).cast("int").alias("level"),
                F.col("shard").cast("bigint").alias("shard"),
                F.when(~F.col("_na").eqNullSafe(F.col("_nb")), F.lit("count"))
                .otherwise(F.lit("content"))
                .alias("reason"),
            )
            # MATERIALIZE each level's flag set (kilobytes — bounded
            # by the shard count) before descending: the drill is
            # inherently adaptive (level i+1's scan predicate IS
            # level i's result), and without this each of the three
            # consumers (output union, both semi-joins) would re-plan
            # the level's full checksum scans — 3 scans per level per
            # side instead of 1.
            flagged = flagged.localCheckpoint()
            parts.append(flagged)
            sh = flagged.select(F.col("shard").cast("int").alias("_sh"))
            a_cur = (
                a_cur.withColumn("_sh", (key % mod).cast("int"))
                .join(F.broadcast(sh), "_sh", "left_semi")
                .drop("_sh")
            )
            b_cur = (
                b_cur.withColumn("_sh", (key % mod).cast("int"))
                .join(F.broadcast(sh), "_sh", "left_semi")
                .drop("_sh")
            )
    # final level: per-key fingerprints over the surviving sliver
    ka = (
        a_cur.select(key.alias("_k"), row_fingerprint(cols).alias("_fp"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_na"), F.sum("_fp").alias("_ca"))
    )
    kb = (
        b_cur.select(key.alias("_k"), row_fingerprint(cols).alias("_fp"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_nb"), F.sum("_fp").alias("_cb"))
    )
    keys = (
        ka.join(kb, "_k", "full_outer")
        .filter(
            ~F.col("_na").eqNullSafe(F.col("_nb"))
            | ~F.col("_ca").eqNullSafe(F.col("_cb"))
        )
        .select(
            F.lit(len(levels) + 1).cast("int").alias("level"),
            F.col("_k").cast("bigint").alias("shard"),
            F.when(~F.col("_na").eqNullSafe(F.col("_nb")), F.lit("count"))
            .otherwise(F.lit("content"))
            .alias("reason"),
        )
    )
    parts.append(keys)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
