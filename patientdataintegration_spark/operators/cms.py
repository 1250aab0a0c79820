"""Count-Min sketch as a RELATION: a depth×width counter table built,
merged, and queried entirely with built-in DataFrame aggregates.

Why not `F.count_min_sketch`? Spark ships the CMS *aggregate* (an
opaque binary) but no SQL-level point-query or merge surface — the
binary is only consumable driver-side via the JVM object. Re-expressing
the sketch as a tiny (d, w, c) relation keeps every phase — build,
merge, query — inside whole-stage codegen and makes the state a plain
table you can store, union, and broadcast like any other rollup
(the same state discipline as `operators/incremental`).

The sketch: `depth` independent hash rows of `width` counters; every
value increments one counter per row (`xxhash64(v, seed+d) mod width`);
a point estimate is the MIN over rows of the value's counters. The
reference computes frequency tables eagerly with pandas
`value_counts` (`patient_data_integration.ipynb` metric cells); the
CMS relation is the bounded-state substitute when the item domain is
too large to hold exactly.

Guarantees (Cormode-Muthukrishnan):
- NO UNDERESTIMATE, ever: est(v) >= true(v) unconditionally — every
  occurrence of v hits v's own counters; collisions only add.
- Overestimate bound: per hash row, E[excess] = (N - true(v))/width;
  the min over `depth` rows exceeds k·N/width with probability at
  most (1/k)^depth over the hash draw. Hashing is fixed-seed here, so
  a given (data, seed, depth, width) produces ONE deterministic
  estimate — the suite measures it and pins a generous bound
  (q244: excess·width <= 3·N, i.e. 3x the single-row Markov bound,
  miss probability ~(1/3)^depth per item over seeds).

Scale shape: the state is d·w counters REGARDLESS of input size
(d=4, w=1024 → 4096 longs ≈ 32 KiB); build is one map-side-combined
aggregation (the explode multiplies map-side rows by `depth`, never
the shuffle, which carries only occupied counters); merge is
counter-wise SUM (associative — slices, days, shards all compose);
query broadcasts the state under the query items. Nothing is
data-proportional except the one scan every sketch needs.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(value: Column, d: Column, width: int, seed: int) -> Column:
    """Row-d hash bucket of a value: xxhash64 salted by (seed + d),
    folded to [0, width). pmod keeps the fold non-negative."""
    return F.pmod(F.xxhash64(value, d + F.lit(seed)), F.lit(width))


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 98243,
) -> DataFrame:
    """One slice → CMS counter relation (d, w, c). Counters with zero
    hits are simply absent (sparse representation; `cms_query`
    coalesces misses to 0)."""
    v = F.col(value_col).cast("string")
    return (
        df.select(
            v.alias("v"),
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
        )
        .select("d", _bucket(F.col("v"), F.col("d"), width, seed).alias("w"))
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_merge(states: Sequence[DataFrame]) -> DataFrame:
    """Counter-wise sum of any number of CMS relations built with the
    SAME (depth, width, seed). Associative and commutative — the
    monoid fold `operators/incremental` uses for every other state."""
    u = reduce(DataFrame.unionByName, states)
    return u.groupBy("d", "w").agg(F.sum("c").cast("bigint").alias("c"))


def cms_query(
    state: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 98243,
) -> DataFrame:
    """Point-query a batch of items: min over hash rows of each
    item's counter. `items` is one row per distinct item (extra
    columns pass through). The d·w-row state broadcasts under the
    item side; absent counters read as 0 (an item the sketch never
    saw estimates 0 only if ALL its rows are empty — still >= true)."""
    temps = ("_cms_d", "_cms_w", "_cms_c")
    clash = [c for c in items.columns if c in temps or c == "cms_est"]
    if clash:
        # withColumn over a caller column named 'd'/'w' would silently
        # clobber it; probe through reserved names instead and refuse
        # the (unlikely) reserved-name collision loudly
        raise ValueError(
            f"cms_query: item columns collide with reserved probe/output "
            f"names {clash}; rename them before querying"
        )
    probes = items.withColumn(
        "_cms_d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn(
        "_cms_w",
        _bucket(F.col(item_col).cast("string"), F.col("_cms_d"), width, seed),
    )
    st = state.select(
        F.col("d").alias("_cms_d"),
        F.col("w").alias("_cms_w"),
        F.col("c").alias("_cms_c"),
    )
    hit = probes.join(F.broadcast(st), ["_cms_d", "_cms_w"], "left")
    return (
        hit.groupBy(*items.columns)
        .agg(
            F.min(F.coalesce(F.col("_cms_c"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )
