"""Arbitrary stateful streaming via `transformWithStateInPandas` —
Spark 4's successor to `applyInPandasWithState` (state variables +
timers as first-class objects instead of one opaque state tuple).

`streaming/sessions.py` keeps the applyInPandasWithState spelling;
this module carries the transformWithState spelling so the engine
demonstrates both stateful APIs. The operator here is the running
per-key aggregate (count + sum) — the canonical Update-mode stateful
shape: O(1) ValueState per key, one emitted row per key per
micro-batch, correctness checkable against the batch groupBy after
an availableNow drain.

Scale notes: state is a single (n, total) pair per key in the state
store (RocksDB in production) — bounded by key cardinality, not
event volume; the emitted stream is upsert-shaped (latest row per
key wins), which is exactly what a downstream foreachBatch MERGE
expects.

ENVIRONMENT GATE: transformWithState's Python↔JVM state protocol is
protobuf-based; containers without `google.protobuf` cannot run it
(the driver worker crashes with an ImportError at stream start).
`transform_with_state_available()` probes for that, and the pytest
skips — the applyInPandasWithState lane (`streaming/sessions.py`)
stays the covered stateful path there.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

def transform_with_state_available() -> bool:
    """True when the runtime can execute transformWithState (the
    state-protocol protobuf dependency imports cleanly)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


class RunningTotals(StatefulProcessor):
    """Per-key running (count, sum) with a single ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._agg.exists():
            n, total = self._agg.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        self._agg.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})

    def close(self) -> None:
        pass


def running_totals_stream(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "stream_running_totals",
) -> DataFrame:
    """Drain the events parquet through the transformWithState
    processor (availableNow → memory sink) and return the LATEST
    emitted row per user — which, after a full drain, must equal the
    batch per-user count/sum."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.streaming.events import _events_stream

    stream = _events_stream(spark, sf_dir).select("user_id", "value")
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    query = (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    emitted = spark.table(table_name)
    # upsert semantics: the row with the highest running n per key is
    # the latest state snapshot
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
