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
