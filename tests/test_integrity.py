"""`operators/integrity` — the table-fingerprint contract: checksums
are order/partitioning-invariant, localize corruption to the right
shard, and never confuse null placement."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _pairs(df):
    return {
        r.shard: (r.n_rows, str(r.checksum)) for r in df.collect()
    }


def test_checksum_invariant_to_partitioning_and_order(spark):
    """The whole point of the decimal SUM: two clusters that scan the
    same rows in any order/partitioning report identical pairs."""
    from patientdataintegration_spark.operators.integrity import (
        shard_checksum,
    )
    from patientdataintegration_spark.sources.catalog import load_table

    o = load_table(spark, SF_DIR, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    shard = F.col("o_orderkey") % 8
    a = _pairs(shard_checksum(o, cols, shard))
    b = _pairs(
        shard_checksum(
            o.repartition(7, "o_custkey").sortWithinPartitions("o_custkey"),
            cols,
            shard,
        )
    )
    assert a == b and len(a) == 8


def test_table_checksum_empty_side_still_emits_row(spark):
    """The grand-aggregate form: an EMPTY relation yields its one
    (0, NULL) row — so a certificate built on it emits matches=false
    on a wipeout instead of silently dropping the artifact row (r12
    ADVICE on q274's cert) — and two empty sides agree null-safely."""
    from patientdataintegration_spark.operators.integrity import (
        table_checksum,
    )

    full = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    empty = full.filter(F.lit(False))

    e = table_checksum(empty, ["k", "v"]).collect()
    assert len(e) == 1 and e[0].n_rows == 0 and e[0].checksum is None

    def verdict(m, t):
        cm = table_checksum(m, ["k", "v"]).select(
            F.col("n_rows").alias("_nm"), F.col("checksum").alias("_cm")
        )
        ct = table_checksum(t, ["k", "v"]).select(
            F.col("n_rows").alias("_nt"), F.col("checksum").alias("_ct")
        )
        rows = (
            cm.crossJoin(ct)
            .select(
                (
                    (F.col("_nm") == F.col("_nt"))
                    & F.col("_cm").eqNullSafe(F.col("_ct"))
                ).alias("matches")
            )
            .collect()
        )
        assert len(rows) == 1, "certificate row must never disappear"
        return rows[0].matches

    assert verdict(full, full) is True
    assert verdict(empty, empty) is True
    assert verdict(empty, full) is False
    assert verdict(full, empty) is False


def test_checksum_localizes_single_row_corruption(spark):
    """Flipping one column of one row changes exactly the one shard
    that row lives in — the mismatch-localization property a 100 TB
    comparison needs."""
    from patientdataintegration_spark.operators.integrity import (
        shard_checksum,
    )
    from patientdataintegration_spark.sources.catalog import load_table

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    corrupted = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 7, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    shard = F.col("o_orderkey") % 8
    a = _pairs(shard_checksum(o, cols, shard))
    b = _pairs(shard_checksum(corrupted, cols, shard))
    diff = {s for s in a if a[s] != b.get(s)}
    assert diff == {7 % 8}
    # row counts still agree — only the content checksum moved
    assert all(a[s][0] == b[s][0] for s in a)


def test_canonical_row_null_and_framing(spark):
    """(NULL, 'a') vs ('a', NULL) and ('ab','c') vs ('a','bc') must
    all fingerprint differently — explicit null token + separator."""
    from patientdataintegration_spark.operators.integrity import (
        row_fingerprint,
    )

    df = spark.createDataFrame(
        [(None, "a"), ("a", None), ("ab", "c"), ("a", "bc")],
        "x string, y string",
    )
    fps = [
        r.fp
        for r in df.select(
            row_fingerprint(["x", "y"]).alias("fp")
        ).collect()
    ]
    assert len(set(fps)) == 4


def test_locate_divergence_identical_copies_empty(spark):
    from patientdataintegration_spark.operators.integrity import (
        locate_divergence,
    )

    t = spark.createDataFrame(
        [(i, f"v{i}") for i in range(400)], "k bigint, v string"
    )
    out = locate_divergence(t, t, ["k", "v"], "k", levels=(8, 64))
    assert out.count() == 0


def test_locate_divergence_localizes_both_fault_kinds(spark):
    """A content fault (modified value) and a count fault (dropped
    row) each drill to their exact key with the right reason, and no
    clean shard is flagged at any level."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.integrity import (
        locate_divergence,
    )

    a = spark.createDataFrame(
        [(i, f"v{i}") for i in range(400)], "k bigint, v string"
    )
    b = a.filter(F.col("k") != 399).select(
        "k",
        F.when(F.col("k") == 7, F.lit("CORRUPT")).otherwise(F.col("v")).alias(
            "v"
        ),
    )
    out = locate_divergence(a, b, ["k", "v"], "k", levels=(8, 64))
    rows = {(r["level"], r["shard"]): r["reason"] for r in out.collect()}
    assert rows == {
        (1, 7 % 8): "content",
        (1, 399 % 8): "count",
        (2, 7 % 64): "content",
        (2, 399 % 64): "count",
        (3, 7): "content",
        (3, 399): "count",
    }


def test_locate_divergence_count_wins_shared_shard(spark):
    """When a content fault and a count fault land in the SAME level-1
    shard, the shard reports 'count' (the count mismatch is the
    stronger, cheaper-to-check signal); the drill still separates
    them at the key level."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.integrity import (
        locate_divergence,
    )

    a = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k bigint, v string"
    )
    # k=3 modified, k=11 dropped: 3 % 8 == 11 % 8 == 3
    b = a.filter(F.col("k") != 11).select(
        "k",
        F.when(F.col("k") == 3, F.lit("X")).otherwise(F.col("v")).alias("v"),
    )
    out = locate_divergence(a, b, ["k", "v"], "k", levels=(8,))
    rows = {(r["level"], r["shard"]): r["reason"] for r in out.collect()}
    assert rows == {(1, 3): "count", (2, 3): "content", (2, 11): "count"}


def test_locate_divergence_reserved_column_guard(spark):
    """r9 ADVICE: a caller column named like a drill temp (_sh et al)
    must raise loudly instead of being silently clobbered."""
    import pytest

    from patientdataintegration_spark.operators.integrity import (
        locate_divergence,
    )

    a = spark.createDataFrame([(1, 2)], "k bigint, _sh bigint")
    b = spark.createDataFrame([(1, 2)], "k bigint, _sh bigint")
    with pytest.raises(ValueError, match="reserved"):
        locate_divergence(a, b, ["k", "_sh"], "k", levels=(4,))
