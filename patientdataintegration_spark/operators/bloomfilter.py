"""Broadcast Bloom-filter pre-filtering for anti-joins against a
large key store.

The reference's dedup-against-history is an in-memory set lookup
(`patient_data_integration.ipynb` — pandas `isin` over the collected
id column); the registry's distributed spelling is a `left_anti`
join (q117). At 100 TB the anti-join's cost is shuffling BOTH sides
on the key — including the overwhelming majority of delta rows that
were never seen before and match nothing. A Bloom filter inverts
that: compress the store's key set into a fixed-size bitmap (m bits
→ m/8 bytes, kilobytes-to-megabytes for billions of keys at a chosen
false-positive rate), broadcast it, and let every map task discard
definitely-new rows BEFORE the shuffle. Only the false-positive
sliver plus the true duplicates reach the exact anti-join, so the
shuffle volume drops from O(delta) to O(dups + fp_rate·delta) while
the RESULT is bit-identical (Bloom filters have no false negatives).

Spark's own runtime-filter injection does this for equi-joins it can
see through; this module is the explicit, reusable spelling — the
bitmap is an ordinary (word, bits) DataFrame, so it can be built
once, PERSISTED like the q117 fingerprint store, and reused across
daily deltas without rescanning history.

Implementation: k hash probes per key (`xxhash64` with distinct seed
columns — JVM codegen, no UDF); the bitmap is built by bit_or-ing
64-bit words (one shuffle over at most m/64 word indices, map-side
combined), and probed by k broadcast joins against that word table.
A word absent from the table means those 64 bits are all zero —
`coalesce(..., false)` keeps the no-hit fast path exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _probe_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) for a key — xxhash64 salted by
    a literal seed column per probe."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_bitmap(
    store: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 2
) -> DataFrame:
    """Build the (word, bits) bitmap relation of a key store.

    One scan of the store, exploding to k positions, then a map-side-
    combined bit_or over at most m_bits/64 word indices — the result
    is at most m_bits/8 bytes of payload regardless of store size,
    i.e. always broadcastable. Persist it alongside the store to
    amortize across deltas.
    """
    pos = F.explode(
        F.array(*_probe_positions(F.col(key_col), m_bits, k))
    ).alias("pos")
    exploded = store.select(pos)
    return exploded.groupBy(
        F.expr("pos DIV 64").alias("word")
    ).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")).alias("bits")
    )


def bloom_maybe_contains(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 2,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Tag each row with whether the Bloom filter MIGHT contain its
    key (all k probed bits set). k broadcast joins against the word
    table; false means definitely-absent (exact), true means
    probably-present (false positives at the configured rate).
    """
    temps = [
        name
        for i in range(k)
        for name in (f"_bf_w{i}", f"_bf_p{i}", f"_bf_bits{i}")
    ]
    clash = [c for c in df.columns if c in temps or c == out_col]
    if clash:
        # dropping by prefix would silently delete caller data; the
        # probe names are reserved for the duration of this call
        raise ValueError(
            f"bloom_maybe_contains: input columns collide with reserved "
            f"probe/output names {clash}; rename them before tagging"
        )
    out = df
    hit_cols = []
    for i, pos in enumerate(_probe_positions(F.col(key_col), m_bits, k)):
        w, p = f"_bf_w{i}", f"_bf_p{i}"
        out = out.withColumn(p, pos).withColumn(w, F.expr(f"{p} DIV 64"))
        bm = F.broadcast(
            bitmap.select(
                F.col("word").alias(w), F.col("bits").alias(f"_bf_bits{i}")
            )
        )
        out = out.join(bm, w, "left")
        hit_cols.append(
            F.coalesce(
                F.expr(
                    f"(_bf_bits{i} & shiftleft(1L, CAST({p} % 64 AS INT))) != 0"
                ),
                F.lit(False),
            )
        )
    maybe = hit_cols[0]
    for h in hit_cols[1:]:
        maybe = maybe & h
    out = out.withColumn(out_col, maybe)
    return out.drop(*temps)


def merge_bloom_bitmaps(bitmaps: "list[DataFrame]") -> DataFrame:
    """OR-fold any number of (word, bits) bitmaps built with the SAME
    (m_bits, k): union the word tables and bit_or per word. Because a
    Bloom bitmap is the OR of its keys' bit positions, the merge of
    per-slice bitmaps is BIT-IDENTICAL to one bitmap over the union
    of the slices — associative AND idempotent (re-adding a slice, or
    a key present in both slices, is harmless). This is what makes
    the store maintainable: yesterday's persisted bitmap plus a
    bitmap of today's new keys replaces a full history re-scan with
    an OR over at most m_bits/64 word rows."""
    from functools import reduce

    u = reduce(DataFrame.unionByName, bitmaps)
    return u.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def save_bloom_bitmap(bitmap: DataFrame, path: str) -> None:
    """Persist a (word, bits) bitmap as parquet next to its key store
    (the module-docstring promise): at most m_bits/8 bytes of payload,
    one file, so the write is a metadata-sized job."""
    bitmap.coalesce(1).write.mode("overwrite").parquet(path)


def load_bloom_bitmap(spark, path: str) -> DataFrame:
    """Read a persisted bitmap back for the next delta's prefilter —
    no history re-scan; pair with `merge_bloom_bitmaps` to fold in
    the keys that delta adds before persisting the next generation."""
    return spark.read.parquet(path).select("word", "bits")


def bloom_prefiltered_antijoin(
    delta: DataFrame,
    store: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 2,
    bitmap: DataFrame | None = None,
) -> DataFrame:
    """`delta LEFT ANTI JOIN store ON key` with the Bloom fast path:
    rows the bitmap rules out bypass the shuffle entirely; only
    maybe-duplicates reach the exact anti-join. Bit-identical result
    to the plain anti-join (no false negatives), verified by the
    q240 oracle which states the plain NOT EXISTS.

    Pass `bitmap` (a persisted generation loaded via
    `load_bloom_bitmap`) to skip rebuilding it from the store — the
    store itself is then touched only by the exact anti-join's
    surviving sliver.

    Size m_bits for the store's key cardinality: fp_rate ≈
    (1 − e^(−k·n/m))^k; the defaults (m=2^20, k=2) give ~1% at
    n≈50k keys — at larger stores, grow m (the bitmap stays
    broadcastable: 2^30 bits = 128 MiB covers ~5·10^8 keys at 1%;
    beyond that, partition the store and bloom per partition).
    """
    if bitmap is None:
        bitmap = bloom_bitmap(store, key_col, m_bits, k)
    tagged = bloom_maybe_contains(delta, key_col, bitmap, m_bits, k)
    definite_new = tagged.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
    survivors = (
        tagged.filter(F.col("bloom_maybe"))
        .drop("bloom_maybe")
        .join(store.select(key_col), key_col, "left_anti")
    )
    return definite_new.unionByName(survivors)
