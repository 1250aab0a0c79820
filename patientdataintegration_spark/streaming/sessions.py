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
) -> DataFrame:
    """Run stateful sessionization over the events parquet as a real
    stream (file source → applyInPandasWithState → availableNow →
    memory sink) and return the emitted sessions."""
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
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
    query = (
        sessions.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table_name)
