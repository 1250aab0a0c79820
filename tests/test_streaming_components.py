"""Streaming maintained dedup loop (`streaming/components`):
signature deltas arrive as files, each micro-batch advances the
persisted (sigs, pairs, labels) stores through maintain_lsh_pairs +
maintain_components, and the final labels CONVERGE to the batch
recompute (q268's equivalence, applied per batch) — including across
a checkpointed restart, with an empty restart advancing nothing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from patientdataintegration_spark.streaming.components import (
    _latest_version,
    components_stream,
    seed_stores,
)

# bands=2, rows=2 -> signature columns mh_0..mh_3; docs sharing
# (mh_0, mh_1) collide in band 0, (mh_2, mh_3) in band 1
SIG_SCHEMA = "doc_id bigint, mh_0 bigint, mh_1 bigint, mh_2 bigint, mh_3 bigint"


def _full_recompute(spark, *sig_sets):
    from patientdataintegration_spark.operators.dedup import (
        connected_components_star,
        lsh_candidate_pairs,
    )

    rows = [r for s in sig_sets for r in s]
    sigs = spark.createDataFrame(rows, SIG_SCHEMA)
    pairs = lsh_candidate_pairs(sigs, bands=2, rows_per_band=2)
    return sorted(map(tuple, connected_components_star(pairs).collect()))


def test_stream_converges_to_batch_across_restarts(spark, tmp_path):
    from patientdataintegration_spark.operators.dedup import (
        connected_components_star,
        lsh_candidate_pairs,
    )

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(store)

    # corpus: {1,2} share band 0 (10,11); 3 alone; 60 alone
    hist = [
        (1, 10, 11, 1001, 1002),
        (2, 10, 11, 2001, 2002),
        (3, 30, 31, 3001, 3002),
        (60, 61, 62, 6001, 6002),
    ]
    # delta A: 4 bridges to 3 via band 1 AND to 1 via band 0 -> merges
    # {1,2} with {3}; 50 is brand new and pairs with nothing
    delta_a = [
        (4, 10, 11, 3001, 3002),
        (50, 51, 52, 5001, 5002),
    ]
    # delta B: 0 undercuts every old id and joins the merged cluster
    # (new-min re-label); 70 pairs with old loner 60
    delta_b = [
        (0, 10, 11, 9001, 9002),
        (70, 61, 62, 7001, 7002),
    ]

    hist_sigs = spark.createDataFrame(hist, SIG_SCHEMA)
    pairs0 = lsh_candidate_pairs(hist_sigs, bands=2, rows_per_band=2)
    labels0 = connected_components_star(pairs0)
    seed_stores(hist_sigs, pairs0, labels0, store)

    def run():
        return components_stream(
            spark, src, "*.parquet", store, ckpt, bands=2, rows_per_band=2
        )

    # run 1: delta A is one micro-batch
    spark.createDataFrame(delta_a, SIG_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got1 = sorted(map(tuple, run().collect()))
    assert got1 == _full_recompute(spark, hist, delta_a)
    g1 = dict(got1)
    assert g1[1] == g1[2] == g1[3] == g1[4] == 1, "delta bridge merges"
    assert 50 not in g1, "pairless new doc stays unclustered"

    # run 2 (checkpointed restart): ONLY delta B processes, against
    # the surviving state; labels converge to the full batch result
    spark.createDataFrame(delta_b, SIG_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got2 = sorted(map(tuple, run().collect()))
    assert got2 == _full_recompute(spark, hist, delta_a, delta_b)
    g2 = dict(got2)
    assert g2[0] == g2[1] == g2[2] == g2[3] == g2[4] == 0, "new-min re-label"
    assert g2[60] == g2[70] == 60, "old loner clusters with delta partner"
    assert _latest_version(store, "labels") == 2

    # run 3: nothing new -> no batch runs, state version unchanged
    got3 = sorted(map(tuple, run().collect()))
    assert got3 == got2
    assert _latest_version(store, "labels") == 2

    # the maintained pair view equals the full recompute's pair set
    from patientdataintegration_spark.operators.dedup import (
        lsh_candidate_pairs as lcp,
    )

    all_sigs = spark.createDataFrame(hist + delta_a + delta_b, SIG_SCHEMA)
    want_pairs = sorted(
        map(tuple, lcp(all_sigs, bands=2, rows_per_band=2).collect())
    )
    got_pairs = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(store, "pairs_v2")).collect(),
        )
    )
    assert got_pairs == want_pairs


def test_crud_stream_applies_takedowns_after_inserts(spark, tmp_path):
    """Full-CRUD stream (op_col): takedowns ride the same micro-
    batches as ingest and apply AFTER the batch's inserts — the
    final labels equal the batch recompute over (corpus ∖ deleted),
    including a same-batch ingest+takedown (ends deleted), a seed-doc
    takedown that SPLITS a seeded chain, and a later-batch
    re-ingest of a previously taken-down id (a new doc)."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.dedup import (
        connected_components_star,
        lsh_candidate_pairs,
    )

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(store)

    # seed: chain {1,2,3} (1-2 via band 0, 2-3 via band 1); loner 60
    hist = [
        (1, 10, 11, 1001, 1002),
        (2, 10, 11, 2001, 2002),
        (3, 30, 31, 2001, 2002),
        (60, 61, 62, 6001, 6002),
    ]
    hist_sigs = spark.createDataFrame(hist, SIG_SCHEMA)
    pairs0 = lsh_candidate_pairs(hist_sigs, bands=2, rows_per_band=2)
    labels0 = connected_components_star(pairs0)
    seed_stores(hist_sigs, pairs0, labels0, store)

    CRUD_SCHEMA = SIG_SCHEMA + ", op int"
    # batch A: ingest 4 (pairs with 1 via band 0) and 50 (pairs with
    # nothing, then taken down IN THE SAME BATCH); take down 2 — the
    # chain's bridge, splitting {1,3,4-side} from {3}
    batch_a = [
        (4, 10, 11, 4001, 4002, 1),
        (50, 51, 52, 5001, 5002, 1),
        (50, None, None, None, None, -1),
        (2, None, None, None, None, -1),
    ]
    # batch B: re-ingest id 50 with signatures pairing it to 60
    batch_b = [(50, 61, 62, 9001, 9002, 1)]

    def run():
        return components_stream(
            spark, src, "*.parquet", store, ckpt,
            bands=2, rows_per_band=2, op_col="op",
        )

    spark.createDataFrame(batch_a, CRUD_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got1 = dict(run().collect())
    assert got1 == {1: 1, 4: 1}, (
        "batch A: 4 joins 1 (band 0); taken-down 2 splits the chain,"
        " orphaning 3 out of the labeling; same-batch ingest+takedown"
        " of 50 ends deleted; loner 60 was never clustered"
    )

    spark.createDataFrame(batch_b, CRUD_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got2 = dict(run().collect())
    assert got2[50] == got2[60] == 50, "re-ingested id is a new doc"
    assert got2[1] == got2[4] == 1

    # equivalence with the batch recompute over the surviving corpus
    surviving = [hist[0], hist[3], (4, 10, 11, 4001, 4002),
                 (50, 61, 62, 9001, 9002)]
    want = sorted(map(tuple, connected_components_star(
        lsh_candidate_pairs(
            spark.createDataFrame(surviving, SIG_SCHEMA),
            bands=2, rows_per_band=2,
        )
    ).collect()))
    assert sorted(got2.items()) == want
