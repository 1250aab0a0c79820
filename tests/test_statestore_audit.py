"""State-store introspection lane (q236): eviction-frontier
calibration (including the exact boundary tie) and the
emitted ∪ state == batch reconciliation.
"""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from patientdataintegration_spark.sources.catalog import load_table
from patientdataintegration_spark.streaming.statestore import statestore_audit


def _write_events(spark, rows) -> str:
    """Stage a minimal events.parquet (single file, driver layout)
    from (event_id, epoch_us, user_id, event_type, value) rows."""
    d = tempfile.mkdtemp(prefix="pdi_test_events_")
    df = (
        spark.createDataFrame(
            [(*r, "{}") for r in rows],
            "event_id bigint, us bigint, user_id bigint, "
            "event_type string, value double, props string",
        )
        .select(
            "event_id",
            F.timestamp_micros("us").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    df.coalesce(1).write.mode("overwrite").parquet(d + "/_stage")
    part = glob.glob(d + "/_stage/part-*.parquet")[0]
    shutil.move(part, d + "/events.parquet")
    shutil.rmtree(d + "/_stage")
    return d


def test_eviction_frontier_boundary_tie(spark):
    """Pin the eviction rule the q236 oracle replays: a window whose
    end lands EXACTLY on the final watermark (end == max_ts − 60 min,
    at ms precision) is EMITTED (`end <= watermark`), not retained —
    the `<=` vs `<` distinction the organic data can't discriminate.
    """
    w1_start = 1_000_000_500  # divisible by 300 → its own bucket
    w1_end = w1_start + 300
    max_ts = w1_end + 3600  # watermark = max_ts − 1h == w1_end exactly
    d = _write_events(
        spark,
        [
            (1, w1_start * 1_000_000, 10, "click", 1.0),
            (2, max_ts * 1_000_000, 11, "click", 2.0),
        ],
    )
    try:
        out = {
            (r["bucket"], r["origin"])
            for r in statestore_audit(spark, d, table_name="tie_emitted").collect()
        }
        assert (w1_start, "emitted") in out  # end == wm → emitted
        assert (max_ts, "state") in out  # the max-ts window stays open
        assert len(out) == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_statestore_union_reconstructs_batch(spark, sf_dir):
    """The audit's core claim: sink rows plus live state buffers are
    EXACTLY the batch aggregate — same keys, same counts, same
    decimal-exact sums — and both origins are non-empty (the lane
    actually exercises the state source, not just the sink)."""
    out = statestore_audit(spark, sf_dir, table_name="recon_emitted").cache()
    try:
        n_emitted = out.filter("origin = 'emitted'").count()
        n_state = out.filter("origin = 'state'").count()
        assert n_emitted > 0 and n_state > 0

        ev = load_table(spark, sf_dir, "events")
        batch = ev.groupBy(
            (F.floor(F.unix_timestamp("ts") / 300) * 300)
            .cast("bigint")
            .alias("bucket"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        stitched = out.drop("origin")
        assert stitched.exceptAll(batch).count() == 0
        assert batch.exceptAll(stitched).count() == 0
    finally:
        out.unpersist()


def test_sessionizer_state_union_reconstructs_batch(spark, sf_dir):
    """q245's core claim (the q236 audit extended to the CUSTOM
    stateful operator): emitted sessions plus the checkpoint's live
    open sessions are EXACTLY the batch sessionization — and both
    origins are non-empty, so the lane exercises the
    applyInPandasWithState state projection, not just the sink."""
    from patientdataintegration_spark.operators.sessionize import sessionize
    from patientdataintegration_spark.streaming.statestore import (
        sessionize_statestore_audit,
    )

    out = sessionize_statestore_audit(
        spark,
        sf_dir,
        gap_seconds=43200,
        watermark="0 seconds",
        table_name="recon_sess_emitted",
    ).cache()
    try:
        n_emitted = out.filter("origin = 'emitted'").count()
        n_state = out.filter("origin = 'state'").count()
        assert n_emitted > 0 and n_state > 0

        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id"
        )
        batch = sessionize(ev, gap_seconds=43200).select(
            "user_id",
            F.col("start_us").alias("session_start_us"),
            F.col("end_us").alias("session_end_us"),
            "n_events",
        )
        stitched = out.drop("origin")
        assert stitched.exceptAll(batch).count() == 0
        assert batch.exceptAll(stitched).count() == 0
    finally:
        out.unpersist()


def test_state_sizing_on_sessionizer_checkpoint(spark, sf_dir):
    """The capacity probe (`statestore.state_sizing`) against the
    q245 sessionizer's checkpoint: live-key count matches the
    statestore source, the overhead/marginal split is internally
    consistent, and the projection is exactly the documented linear
    model — the README's 100 TB state-sizing guidance, checkable."""
    from patientdataintegration_spark.scratch import scratch_dir
    from patientdataintegration_spark.streaming.sessions import (
        sessionize_stream,
    )
    from patientdataintegration_spark.streaming.statestore import state_sizing

    ckpt = scratch_dir("sizing_test_ckpt", sf_dir)
    sessionize_stream(
        spark,
        sf_dir,
        gap_seconds=43200,
        watermark="0 seconds",
        table_name="sizing_test_emitted",
        checkpoint=ckpt,
    )
    n_live = spark.read.format("statestore").load(ckpt).count()
    rep = state_sizing(spark, ckpt, target_keys=1_000_000,
                       target_partitions=20_000)
    assert rep["operator_name"] == "applyInPandasWithState"
    assert rep["n_keys"] == n_live > 0
    assert rep["n_partitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    assert rep["state_bytes"] > 0
    assert rep["overhead_bytes_per_partition"] >= 0
    assert rep["bytes_per_key"] >= 0
    # the projection IS the documented linear model
    assert rep["projected_bytes"] == int(
        20_000 * rep["overhead_bytes_per_partition"]
        + 1_000_000 * rep["bytes_per_key"]
    )
    # sanity: the overhead estimate is one partition's bytes, so it
    # can never exceed the whole store's observed total
    assert rep["overhead_bytes_per_partition"] <= rep["state_bytes"]


def test_state_sizing_scopes_to_operator(spark):
    """Pin the r12 ADVICE fix: state_sizing(operator_id=N) must count
    operator N's OWN keys (the statestore source defaults to operator
    0). A two-stateful-operator query — streaming dropDuplicates
    feeding a windowed count — has different key cardinalities per
    operator (8 distinct event ids vs 2 windows); each operator's
    report must match its own cardinality, which the unscoped read
    could not (it returned operator 0's count for both)."""
    import os
    import tempfile

    from patientdataintegration_spark.streaming.statestore import state_sizing

    root = tempfile.mkdtemp(prefix="pdi_sizing_")
    src = os.path.join(root, "src")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)
    base = 1_700_000_000
    rows = []
    for i in range(8):  # 8 distinct ids, each duplicated once
        win = 0 if i < 5 else 600  # 5 ids in window A, 3 in window B
        for _ in range(2):
            rows.append((i, (base + win + i) * 1_000_000))
    df = spark.createDataFrame(rows, "event_id bigint, us bigint").select(
        "event_id", F.timestamp_micros("us").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp")
        .parquet(src)
        .dropDuplicates(["event_id"])
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sizing_two_ops")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    names = {
        r["operatorId"]: r["operatorName"]
        for r in spark.read.format("state-metadata").load(ckpt).collect()
    }
    assert len(names) == 2, f"expected two stateful operators, got {names}"
    want_by_name = {"dedupe": 8, "stateStoreSave": 2}
    for op_id, op_name in names.items():
        rep = state_sizing(spark, ckpt, operator_id=op_id)
        assert rep["n_keys"] == want_by_name[op_name], (
            f"operator {op_id} ({op_name}) reported {rep['n_keys']} keys"
        )
        assert rep["operator_name"] == op_name
