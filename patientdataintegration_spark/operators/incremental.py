"""Incremental aggregate maintenance: mergeable partial rollups.

At 100 TB the daily pattern is never "re-aggregate everything" — it
is "keep a per-key rollup table, aggregate ONLY today's delta, and
merge". That works exactly when the stored state is a commutative
monoid per aggregate: (count, sum, min, max) merge by (+, +, min,
max), and derived statistics (avg) are reconstructed at read time
from the merged state, never stored.

Exactness contract: the sum state is `decimal(18,6)` — decimal
addition is associative and order-independent, so merging any
partitioning of the data (historical ∪ delta, or 365 daily rollups)
is bit-identical to one aggregation of the full table. That identity
IS the oracle twin for q114 (a plain GROUP BY over the whole table).

Scale shape: each `partial_rollup` is one map-side-combined
hash-agg over just its slice; `merge_rollups` unions O(#keys)-sized
states and re-aggregates — shuffle is proportional to the KEY
cardinality, not the data. The reference has no incremental path
(it recomputes per run, `functions_v2.py` metric loops); this is the
Spark-native replacement.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, functions as F

STATE_COLS = ("n", "sum_dec", "min_v", "max_v")


def partial_rollup(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Aggregate one slice into mergeable per-key state
    (keys…, n, sum_dec, min_v, max_v)."""
    return df.groupBy(*keys).agg(
        F.count(value_col).cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sum_dec"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_rollups(rollups: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Merge any number of partial-rollup states into one: the monoid
    fold. Equivalent (bit-exact) to `partial_rollup` over the union
    of the underlying slices."""
    u = reduce(DataFrame.unionByName, rollups)
    return u.groupBy(*keys).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sum_dec").cast("decimal(18,6)").alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def rollup_readout(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Read-time view over merged state: exact sum as double plus the
    reconstructed average (double division of exact operands — one
    deterministic IEEE op, identical across engines)."""
    return state.select(
        *keys,
        "n",
        F.col("sum_dec").cast("double").alias("sum_v"),
        (F.col("sum_dec").cast("double") / F.col("n")).alias("avg_v"),
        "min_v",
        "max_v",
    )


# --- incremental DISTINCT maintenance (HLL sketch state) --------------------
#
# (count, sum, min, max) merge trivially; COUNT DISTINCT is the one
# everyday aggregate that does NOT — its exact state is the value set
# itself. The mergeable substitute is an HLL sketch column: per-key
# sketch state persists next to the rollup table (a binary column,
# kilobytes per key), today's delta contributes its own sketch, and
# `hll_union_agg` merges them with NO history re-scan. Spark's
# DataSketches HLL union over a partition of the data is IDENTICAL
# (same registers, same estimate) to one sketch over the whole — so
# incremental maintenance costs nothing in accuracy vs a full rebuild
# (pinned by tests/test_sketches.py::test_hll_union_agg_matches_flat_
# sketch and the q241 oracle lane).


def distinct_sketch_state(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Aggregate one slice into per-key HLL distinct state
    (keys…, sk binary) — one map-side-combined hash-agg over the
    slice, same shape discipline as `partial_rollup`."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(value_col).alias("sk"))


def merge_distinct_states(
    states: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Monoid fold of HLL states: union any number of per-slice state
    tables and re-union per key. Shuffle is O(#keys × #slices) binary
    sketches, independent of the underlying data volume."""
    u = reduce(DataFrame.unionByName, states)
    return u.groupBy(*keys).agg(F.hll_union_agg("sk").alias("sk"))


def distinct_readout(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Read-time distinct estimate per key from merged state."""
    return state.select(
        *keys, F.hll_sketch_estimate("sk").alias("n_distinct_est")
    )
