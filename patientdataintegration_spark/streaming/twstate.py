"""Arbitrary stateful streaming via Spark 4's `transformWithState`
API (`StatefulProcessor` + typed state variables) — the successor to
`applyInPandasWithState` used in `streaming/sessions.py`; both are
kept so a user can run either generation of the API.

Demonstrated operator: per-user running totals with a ValueState —
the minimal "keyed accumulator" every metering/billing/feature-store
pipeline needs. State is O(1) per key (two numbers), the processor
sees Arrow record batches, and the RocksDB state store backend (the
provider transformWithState requires) spills to disk instead of
executor heap — the property that matters when 100 TB of events
carry hundreds of millions of keys.

No oracle: streaming execution with state-store semantics is not
SQL-expressible; pytest pins equality against the batch aggregate.

DEPENDENCY GATE: transformWithState's Python driver worker requires
`google.protobuf` (its state-server protocol is protobuf-encoded),
which this container does not ship. `transform_with_state_available()`
probes for it; the pytest skips with that reason where absent, and
`streaming/sessions.py` (applyInPandasWithState — no protobuf
dependency) remains the fully-exercised stateful lane.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id bigint, n bigint, value_cents bigint"


def transform_with_state_available() -> bool:
    """True when the transformWithState Python worker can start
    (needs google.protobuf, not shipped in every environment)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningUserTotals(StatefulProcessor):
    """ValueState-backed keyed accumulator: (event count, value sum).

    The value sum accumulates in integer cents (floor(value*100))
    so state merge order never changes the result — the same
    exactness discipline as the batch suite."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n bigint, cents bigint")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            n, cents = self._totals.get()
        else:
            n, cents = 0, 0
        for pdf in rows:
            n += len(pdf)
            cents += int((pdf["value"] * 100).floordiv(1).sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "value_cents": [cents]}
        )

    def close(self) -> None:
        pass


def running_user_totals_stream(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "tws_user_totals",
) -> DataFrame:
    """Run the stateful processor over the event backlog (availableNow
    → memory sink) and return one final row per user. Update-mode
    emissions mean a user may appear once per micro-batch; the last
    row per user is the final state — with availableNow + maxFilesPerTrigger
    unset the whole backlog is one batch, so rows are already final."""
    from patientdataintegration_spark.streaming.events import _events_stream

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = _events_stream(spark, sf_dir)
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    query: StreamingQuery = (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table_name)
