"""Streaming maintained top-k (`streaming/topk.topk_stream`):
batch-equivalence of the single-backlog run, and the exactly-once
restart/replay contract — state survives a checkpointed restart, a
new file merges into the surviving state (processing ONLY the new
data), and a restart with nothing new emits nothing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from patientdataintegration_spark.streaming.topk import topk_stream

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _batch_topk(spark, rows, k=2):
    df = spark.createDataFrame(rows, "key bigint, value double, id bigint")
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy(
        F.col("value").desc(), F.col("id").asc()
    )
    return {
        (r["key"], r["rank"], r["id"], r["value"])
        for r in df.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .collect()
    }


def test_single_backlog_equals_batch_ranking(spark, tmp_path):
    """One parquet file = one micro-batch under availableNow, so the
    emission log IS the batch top-k (the q270 oracle's premise)."""
    rows = [
        (1, 10.0, 100), (1, 30.0, 101), (1, 20.0, 102),
        (2, 5.0, 200), (2, 5.0, 201),  # value tie -> id ASC decides
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "key bigint, value double, id bigint"
    ).coalesce(1).write.parquet(src)
    got = topk_stream(
        spark, src, "*.parquet", "key", "value", "id", k=2,
        table_name="tt_topk_single",
    )
    emitted = {
        (r["key"], r["rank"], r["id"], r["value"]) for r in got.collect()
    }
    assert emitted == _batch_topk(spark, rows, k=2)
    assert (2, 1, 200, 5.0) in emitted and (2, 2, 201, 5.0) in emitted


def test_restart_merges_state_and_replays_nothing(spark, tmp_path):
    """Three checkpointed runs over a growing source dir (parquet
    sink — the memory sink refuses checkpoint recovery):

    1. file A            -> emits top-k(A)
    2. file B appended   -> processes ONLY B; touched keys emit the
                            MERGED top-k (state survived the restart);
                            keys untouched by B emit nothing
    3. nothing appended  -> emits nothing (offsets replayed, no dup)

    The parquet sink is cumulative, so each run's own emissions are
    the multiset difference vs the previous cumulative read.
    """
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(src)

    def cum(df):
        return sorted(
            (r["key"], r["rank"], r["id"], r["value"]) for r in df.collect()
        )

    rows_a = [(1, 10.0, 100), (1, 30.0, 101), (9, 1.0, 900)]
    spark.createDataFrame(
        rows_a, "key bigint, value double, id bigint"
    ).coalesce(1).write.mode("append").parquet(src)
    c1 = cum(
        topk_stream(
            spark, src, "*.parquet", "key", "value", "id", k=2,
            checkpoint=ckpt, sink_path=sink,
        )
    )
    assert set(c1) == _batch_topk(spark, rows_a, k=2)
    assert len(c1) == len(set(c1))  # no duplicate emissions

    # run 2: key 1 gets a new entrant (20.0 evicts id 100 from the
    # k=2 state); key 9 is untouched and must NOT re-emit
    rows_b = [(1, 20.0, 102)]
    spark.createDataFrame(
        rows_b, "key bigint, value double, id bigint"
    ).coalesce(1).write.mode("append").parquet(src)
    c2 = cum(
        topk_stream(
            spark, src, "*.parquet", "key", "value", "id", k=2,
            checkpoint=ckpt, sink_path=sink,
        )
    )
    run2 = list(c2)
    for row in c1:
        run2.remove(row)  # multiset difference
    assert sorted(run2) == [(1, 1, 101, 30.0), (1, 2, 102, 20.0)], (
        "state must merge across the restart: 30.0 (from run 1's"
        " state) stays rank 1, the new 20.0 takes rank 2, and"
        " untouched key 9 emits nothing"
    )

    # run 3: no new files -> the replayed offsets yield zero emissions
    c3 = cum(
        topk_stream(
            spark, src, "*.parquet", "key", "value", "id", k=2,
            checkpoint=ckpt, sink_path=sink,
        )
    )
    assert c3 == c2


def test_null_key_value_or_id_rows_are_excluded(spark, tmp_path):
    """NULL semantics (r11 ADVICE): a row with a NULL key, value or
    id has no place in the (value DESC, id ASC) total order, so it is
    filtered before the state function — same discipline as the batch
    topk_state / histogram_state NULL-measure filters — instead of
    crashing the pandas worker on int(None)."""
    rows = [
        (1, 10.0, 100),
        (1, 30.0, 101),
        (None, 99.0, 400),   # NULL key: no group to rank in
        (1, None, 102),      # NULL value: no rank position
        (1, 40.0, None),     # NULL id: no deterministic tiebreak
        (2, 5.0, 200),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "key bigint, value double, id bigint"
    ).coalesce(1).write.parquet(src)
    got = topk_stream(
        spark, src, "*.parquet", "key", "value", "id", k=2,
        table_name="tt_topk_nulls",
    )
    emitted = {
        (r["key"], r["rank"], r["id"], r["value"]) for r in got.collect()
    }
    clean = [r for r in rows if None not in r]
    assert emitted == _batch_topk(spark, clean, k=2)
