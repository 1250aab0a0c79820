"""Stateful streaming sessionization via `applyInPandasWithState`.

The custom-stateful-operator lane: gap-based sessions computed
incrementally per user with explicit keyed state and event-time
timeouts — the Structured Streaming pattern for operators the
built-in windowed aggregations can't express (per-key ordering
logic, custom emission rules).

Semantics match `operators/sessionize.sessionize` exactly, which is
what the pytest asserts: run this with an `availableNow` trigger
over the static events parquet and the emitted sessions equal the
batch operator's output.

State design (the 100 TB part): state per user is ONE open session
(start, last-seen, count) — O(1) per key, not the event history.
Events inside a micro-batch are sorted in-memory per key (Arrow
batch, pandas sort — bounded by a batch's per-key volume, not
total history); sessions that close within or across batches are
emitted as soon as the gap is observed, and the final open session
is flushed on event-time timeout once the watermark passes
last_seen + gap. Late events older than the watermark were already
dropped by the engine, so state never reopens a closed session.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from patientdataintegration_spark.sources.catalog import (
    enable_nanos_read,
    normalize_timestamps,
)
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def make_sessionizer(gap_seconds: int = 1800):
    """Build the per-key state function (gap captured in closure)."""
    gap_us = int(gap_seconds) * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((user_id, s, e, n))
                state.remove()
            yield pd.DataFrame(closed, columns=SESSION_SCHEMA.fieldNames())
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("us")
        cur = state.get if state.exists else None  # (start, end, n)
        for us in rows["us"].astype("int64"):
            us = int(us)
            if cur is None:
                cur = (us, us, 1)
            elif us - cur[1] > gap_us:
                closed.append((user_id, cur[0], cur[1], cur[2]))
                cur = (us, us, 1)
            else:
                cur = (cur[0], max(cur[1], us), cur[2] + 1)
        state.update(cur)
        # flush the open session once the watermark clears its gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000 + 1)
        yield pd.DataFrame(closed, columns=SESSION_SCHEMA.fieldNames())

    return fn


def sessionize_stream(
    spark: SparkSession,
    sf_dir: str,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    table_name: str = "stream_sessions",
    checkpoint: str | None = None,
) -> DataFrame:
    """Run stateful sessionization over the events parquet as a real
    stream (file source → applyInPandasWithState → availableNow →
    memory sink) and return the emitted sessions.

    `checkpoint` pins the checkpoint location so callers can read the
    keyed state back afterwards (`streaming/statestore.
    read_session_state` — the q245 audit); None lets Spark use a
    throwaway temp checkpoint."""
    enable_nanos_read(spark)  # vanilla sessions reject TIMESTAMP(NANOS) otherwise
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    stream = normalize_timestamps(stream)
    prepared = (
        stream.withWatermark("ts", watermark)
        .select("user_id", "ts", F.unix_micros("ts").alias("us"))
    )
    sessions = prepared.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        sessions.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    query = writer.start()
    query.awaitTermination()
    return spark.table(table_name)


def interval_join_stream(
    spark: SparkSession,
    sf_dir: str,
    window_hours: int = 24,
    table_name: str = "stream_interval_join",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join (the streaming twin of the
    batch interval join q47): errors joined to same-user clicks within
    the preceding `window_hours`.

    The time-range condition plus both watermarks bound the join
    state: clicks older than (watermark - window) are evicted — this
    is THE mechanism that makes a 100 TB/day stream-stream join
    feasible. availableNow over the static parquet makes the result
    comparable to the batch twin.

    ``how="left_outer"`` emits errors with NO qualifying click as
    null-click rows — but only once the watermark passes the end of
    their join window (state-cleanup = outer-emission time, the
    stream-stream outer contract). With availableNow over a bounded
    source, errors at the stream's maximum timestamp can legitimately
    remain withheld (the watermark never advances past them); the
    batch-twin test accounts for exactly that frontier."""
    enable_nanos_read(spark)  # vanilla sessions reject TIMESTAMP(NANOS) otherwise
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")

    def src():
        s = (
            spark.readStream.schema(raw.schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )
        return normalize_timestamps(s)

    errors = (
        src()
        .filter(F.col("event_type") == "error")
        .withWatermark("ts", "0 seconds")
        .select(F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("e_ts"))
    )
    clicks = (
        src()
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "0 seconds")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    j = errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("e_ts"))
        & (F.col("c_ts") > F.col("e_ts") - F.expr(f"INTERVAL {window_hours} HOURS")),
        how,
    ).select(
        "error_id",
        "click_id",
        "user_id",
        (F.unix_micros("e_ts") - F.unix_micros("c_ts")).alias("micros_between"),
    )
    query = (
        j.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table_name)
