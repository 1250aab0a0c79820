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


def test_bloom_merge_equals_scratch_rebuild(spark):
    """OR-merging per-slice bitmaps is BIT-IDENTICAL to one bitmap
    over the union of the slices — the property that makes the
    persisted store maintainable without history re-scans."""
    from patientdataintegration_spark.operators.bloomfilter import (
        merge_bloom_bitmaps,
    )

    a = spark.createDataFrame([(f"key{i}",) for i in range(0, 500)], "k string")
    b = spark.createDataFrame([(f"key{i}",) for i in range(400, 900)], "k string")
    merged = merge_bloom_bitmaps(
        [bloom_bitmap(a, "k", M_SMALL, 2), bloom_bitmap(b, "k", M_SMALL, 2)]
    )
    scratch = bloom_bitmap(a.union(b), "k", M_SMALL, 2)
    assert merged.exceptAll(scratch).count() == 0
    assert scratch.exceptAll(merged).count() == 0


def test_bloom_persisted_store_generations(spark, tmp_path):
    """The store lifecycle across two delta days: build gen0 from
    history, persist; day1 dedups against the LOADED bitmap (no
    history scan on the prefilter path), folds its new keys in,
    persists gen1; day2 dedups against gen1. Each day's result is
    bit-identical to the plain anti-join, and gen1 equals the
    from-scratch rebuild over history + day1 survivors."""
    from patientdataintegration_spark.operators.bloomfilter import (
        load_bloom_bitmap,
        merge_bloom_bitmaps,
        save_bloom_bitmap,
    )

    hist = spark.createDataFrame(
        [(f"key{i}",) for i in range(0, 2000, 2)], "k string"
    )
    day1 = spark.createDataFrame(
        [(f"key{i}",) for i in range(500, 1500)], "k string"
    )
    day2 = spark.createDataFrame(
        [(f"key{i}",) for i in range(1200, 2500)], "k string"
    )
    p0, p1 = str(tmp_path / "gen0"), str(tmp_path / "gen1")
    save_bloom_bitmap(bloom_bitmap(hist, "k", M_SMALL, 2), p0)

    gen0 = load_bloom_bitmap(spark, p0)
    fresh1 = bloom_prefiltered_antijoin(
        day1, hist, "k", M_SMALL, 2, bitmap=gen0
    )
    plain1 = day1.join(hist.withColumnRenamed("k", "k2"),
                       F.col("k") == F.col("k2"), "left_anti")
    assert fresh1.exceptAll(plain1).count() == 0
    assert plain1.exceptAll(fresh1).count() == 0

    save_bloom_bitmap(
        merge_bloom_bitmaps([gen0, bloom_bitmap(fresh1, "k", M_SMALL, 2)]), p1
    )
    store1 = hist.union(fresh1).distinct()
    scratch1 = bloom_bitmap(store1, "k", M_SMALL, 2)
    gen1 = load_bloom_bitmap(spark, p1)
    assert gen1.exceptAll(scratch1).count() == 0
    assert scratch1.exceptAll(gen1).count() == 0

    fresh2 = bloom_prefiltered_antijoin(
        day2, store1, "k", M_SMALL, 2, bitmap=gen1
    )
    plain2 = day2.join(store1.withColumnRenamed("k", "k2"),
                       F.col("k") == F.col("k2"), "left_anti")
    assert fresh2.exceptAll(plain2).count() == 0
    assert plain2.exceptAll(fresh2).count() == 0
