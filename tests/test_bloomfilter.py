"""Bloom-prefiltered anti-join (operators/bloomfilter.py): result
equality with the plain anti-join, the no-false-negative guarantee,
the shuffle-reduction claim, and the bitmap's size bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from patientdataintegration_spark.operators.bloomfilter import (
    bloom_bitmap,
    bloom_maybe_contains,
    bloom_prefiltered_antijoin,
)
from patientdataintegration_spark.operators.textops import fingerprint
from patientdataintegration_spark.sources.catalog import load_table

M_SMALL = 1 << 14  # deliberately small bitmap → measurable fp rate


def _store_delta(spark):
    store = spark.createDataFrame(
        [(f"key{i}",) for i in range(0, 2000, 2)], "k string"  # evens
    )
    delta = spark.createDataFrame(
        [(f"key{i}", i) for i in range(1000, 3000)], "k string, payload bigint"
    )
    return store, delta


def test_bloom_no_false_negatives(spark):
    """Every key actually in the store must probe positive — the
    property the whole optimization's correctness rests on."""
    store, _ = _store_delta(spark)
    tagged = bloom_maybe_contains(
        store, "k", bloom_bitmap(store, "k", M_SMALL, 2), M_SMALL, 2
    )
    assert tagged.filter(~F.col("bloom_maybe")).count() == 0


def test_bloom_antijoin_equals_plain_antijoin(spark):
    store, delta = _store_delta(spark)
    got = bloom_prefiltered_antijoin(delta, store, "k", M_SMALL, 2)
    plain = delta.join(store.withColumnRenamed("k", "k2"),
                       F.col("k") == F.col("k2"), "left_anti")
    assert got.exceptAll(plain).count() == 0
    assert plain.exceptAll(got).count() == 0
    # sanity: truly-new odd keys and unseen evens >= 2000 survive
    assert got.count() == 1000 + 500


def test_bloom_prefilter_reduces_antijoin_input(spark):
    """The scale claim: the maybe-duplicate set reaching the exact
    anti-join is the true duplicates plus a small fp sliver, far
    below the full delta."""
    store, delta = _store_delta(spark)
    tagged = bloom_maybe_contains(
        delta, "k", bloom_bitmap(store, "k", M_SMALL, 2), M_SMALL, 2
    )
    n_delta = delta.count()  # 2000
    n_maybe = tagged.filter("bloom_maybe").count()
    n_true_dups = 500  # evens in [1000, 2000)
    assert n_maybe >= n_true_dups  # no false negatives
    # fp rate at n=1000 keys, m=2^14, k=2: (1 − e^(−2·1000/16384))^2 ≈ 1.3%
    assert n_maybe <= n_true_dups + int(0.10 * n_delta)


def test_bloom_bitmap_bounded(spark):
    store, _ = _store_delta(spark)
    bm = bloom_bitmap(store, "k", M_SMALL, 2)
    assert bm.count() <= M_SMALL // 64
    assert set(bm.columns) == {"word", "bits"}


def test_q240_matches_q117_semantics(spark, sf_dir):
    """On the real documents split, the Bloom path reproduces the
    plain incremental dedup (q117) row for row."""
    from patientdataintegration_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    d = load_table(spark, sf_dir, "documents")
    fp = fingerprint(d)
    hist = fp.filter(F.col("doc_id") % 10 < 7).select("fingerprint").distinct()
    delta = d.filter(F.col("doc_id") % 10 >= 7)
    plain = incremental_exact_dedup(delta, hist)

    deltafp = fp.filter(F.col("doc_id") % 10 >= 7).select("doc_id", "fingerprint")
    bloom = (
        bloom_prefiltered_antijoin(deltafp, hist, "fingerprint")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    assert bloom.exceptAll(plain).count() == 0
    assert plain.exceptAll(bloom).count() == 0


def test_bloom_reserved_column_collision_raises(spark):
    """A caller column named like a probe temp (or the output column)
    must fail loudly, not be silently dropped (r8 ADVICE)."""
    import pytest

    store, _ = _store_delta(spark)
    bm = bloom_bitmap(store, "k", M_SMALL, 2)
    clashing = store.withColumn("_bf_w0", F.lit(1))
    with pytest.raises(ValueError, match="_bf_w0"):
        bloom_maybe_contains(clashing, "k", bm, M_SMALL, 2)
    out_clash = store.withColumn("bloom_maybe", F.lit(True))
    with pytest.raises(ValueError, match="bloom_maybe"):
        bloom_maybe_contains(out_clash, "k", bm, M_SMALL, 2)
