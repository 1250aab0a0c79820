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

from pyspark.sql import Column, DataFrame, functions as F


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the current layout has fewer
    partitions than the cluster has slots.

    The repartition is a shuffle of the input rows, so it is guarded:
    on a real cluster reading real data volumes the input partition
    count already exceeds ``defaultParallelism`` and this returns the
    DataFrame untouched — zero added shuffle. Deterministic operators
    stay deterministic (every draw/hash in this engine derives from
    row keys, never from partition layout — functions/deterministic).

    The guard probes the OPTIMIZER's size estimate first (plan stats
    / ``maxPartitionBytes``): for the at-scale case — a big file scan
    — the estimate alone says "already wide" and the function returns
    with NO work (the old ``df.rdd.getNumPartitions()`` probe forced
    a full lineage materialization on every call). Only when the
    estimate says the input is small (or is the 8-EB unknown-stats
    sentinel, e.g. some join products) does it fall back to the
    accurate RDD partition count to decide — at that point the frame
    is small or we are about to pay a shuffle anyway, so the probe is
    noise, and the accurate count also prevents a redundant
    repartition of an already-wide small frame.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    jvm = spark.sparkContext._jvm
    size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    if size < (1 << 60):  # a real estimate
        conf = spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        max_bytes = int(
            jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(conf)
        )
        if max(1, -(-size // max_bytes)) >= target:
            return df  # the 100-TB fast path: no probe, no shuffle
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def morton_code(x: Column, y: Column, bits: int = 10) -> Column:
    """Z-order (Morton) interleave of two already-quantized
    non-negative int columns in [0, 2^bits): bit j of x lands at
    position 2j, bit j of y at 2j+1. Pure integer arithmetic —
    engine-portable and exact.

    Z-ordering is how a lakehouse clusters data for MULTI-column
    min-max pruning: sorting by (a, b) prunes scans filtered on `a`
    only, but sorting by morton(a, b) keeps both dimensions local in
    every file, so per-file min/max statistics skip files for range
    predicates on EITHER column."""
    terms = []
    for j in range(bits):
        terms.append(
            F.shiftright(x.cast("bigint"), j).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * j))
        )
        terms.append(
            F.shiftright(y.cast("bigint"), j).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * j + 1))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def morton_code_sql(x: str, y: str, bits: int = 10) -> str:
    """ANSI-SQL twin of `morton_code` for oracle queries."""
    terms = [
        f"(((CAST({x} AS BIGINT) >> {j}) & 1) * {1 << (2 * j)})" for j in range(bits)
    ] + [
        f"(((CAST({y} AS BIGINT) >> {j}) & 1) * {1 << (2 * j + 1)})"
        for j in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def quantize_minmax(col: Column, cmin: Column, cmax: Column, bits: int = 10) -> Column:
    """Quantize a column to [0, 2^bits) by global min-max. One fixed
    IEEE expression (sub, div, mul, floor) — bit-identical in any
    IEEE-754 engine, so quantized codes are oracle-checkable. The
    degenerate max==min group maps to 0."""
    span = cmax - cmin
    q = F.floor((col - cmin) / span * F.lit((1 << bits) - 1))
    return F.when(span == 0, F.lit(0)).otherwise(q).cast("bigint")


def zorder_by(df: DataFrame, x: str, y: str, bits: int = 10) -> DataFrame:
    """Cluster a frame for multi-dimensional pruning: range-partition
    and sort by the Morton code of the two (min-max quantized)
    columns. The written files then carry tight min/max stats on BOTH
    columns. Cost: one stats pass (broadcast 1-row bounds) + the
    range shuffle any clustering write pays."""
    bounds = df.agg(
        F.min(x).alias("_xmin"),
        F.max(x).alias("_xmax"),
        F.min(y).alias("_ymin"),
        F.max(y).alias("_ymax"),
    )
    z = morton_code(
        quantize_minmax(F.col(x), F.col("_xmin"), F.col("_xmax"), bits),
        quantize_minmax(F.col(y), F.col("_ymin"), F.col("_ymax"), bits),
        bits,
    )
    return (
        df.join(F.broadcast(bounds))
        .withColumn("_z", z)
        .repartitionByRange(F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_xmin", "_xmax", "_ymin", "_ymax", "_z")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join: replicate the (small) dim side
    `n_salts` times and scatter each fact row to one replica, so a
    hot join key's rows spread over `n_salts` reducers instead of
    one straggler task.

    The classic manual treatment for the case AQE's skew-join split
    cannot handle: skewOnJoin only splits SHUFFLE partitions of
    sort-merge joins after stats arrive; a persistent hot key inside
    one partition of a pre-shuffled/bucketed layout, or a streaming
    micro-batch join, still needs salting. The fact-side salt is
    `pmod(hash(fact_key), n_salts)` — any per-row value works
    because every salt has a full dim replica; using the key itself
    keeps the operator deterministic and engine-replayable. Result
    is EXACTLY the plain join (each fact row meets each matching dim
    row exactly once — in the replica its salt selects), which is
    what the q221 oracle pins. Cost: dim inflates n_salts x (keep it
    broadcast-small or drop n_salts); the shuffle key becomes
    (key, salt) with n_salts x the cardinality.

    `how` supports inner/left joins (semantics preserved per row:
    an unmatched fact row is unmatched in exactly its one replica)."""
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(F.col(fact_key)), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["_salt"] == replicated_dim["_salt"]),
        how,
    )
    return out.drop("_salt")
