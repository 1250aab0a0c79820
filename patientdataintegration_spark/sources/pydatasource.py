"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) — the
engine's extensibility lane for sources Spark has no built-in reader
for (the reference's ad-hoc cohort loaders, `ExperimentSetup_v2.py:
57-60`, generalized: any lab system / API / proprietary format can
be wrapped this way and then joins the catalog as a first-class
DataFrame with normal pushdown-after-scan planning).

`SyntheticEventsDataSource` is the working demonstration: a
partitioned, deterministic event generator.

- **Partition planning** happens in `partitions()` — the driver-side
  split of the keyspace into independent ranges, exactly how a real
  connector would split by file/offset/shard. Each partition is read
  by one task; parallelism is declared by the source, not inferred
  from bytes.
- **Determinism**: every row derives from its event_id alone
  (md5-based, the engine's deterministic-function discipline), so the
  same options produce the same relation under ANY partition count —
  partition layout never leaks into values.
- At 100 TB the same shape holds: a partition per shard/day, readers
  streaming Arrow batches, no driver materialization.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

EVENT_TYPES = ("click", "view", "purchase", "refund")

SCHEMA_DDL = (
    "event_id bigint, user_id bigint, event_type string, value double"
)


def _row_of(event_id: int, n_users: int) -> tuple[int, int, str, float]:
    digest = hashlib.md5(str(event_id).encode()).digest()
    user_id = int.from_bytes(digest[0:4], "big") % n_users
    etype = EVENT_TYPES[digest[4] % len(EVENT_TYPES)]
    value = int.from_bytes(digest[5:8], "big") % 100_000 / 100.0
    return event_id, user_id, etype, value


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.n_users = int(options.get("users", 100))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for event_id in range(partition.start, partition.end):
            yield _row_of(event_id, self.n_users)


class _SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming view of the same generator: each
    micro-batch advances the event_id cursor by `batch_rows`. Offsets
    are plain dicts the engine checkpoints — restart-safe exactly-once
    ingestion without any broker, the shape of a real queue/CDC tail
    connector. `readBetweenOffsets` replays a committed range
    deterministically (the generator IS the log)."""

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.n_users = int(options.get("users", 100))
        self.max_rows = int(options.get("rows", 1000))

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def read(self, start: dict):
        lo = start["next_id"]
        hi = min(lo + self.batch_rows, self.max_rows)
        rows = [_row_of(i, self.n_users) for i in range(lo, hi)]
        return iter(rows), {"next_id": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            _row_of(i, self.n_users)
            for i in range(start["next_id"], end["next_id"])
        )


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("rows", N)...
    after `spark.dataSource.register(SyntheticEventsDataSource)`;
    also streamable via spark.readStream on the same format name."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticEventsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
