"""Streaming maintained per-key TOP-K via `applyInPandasWithState`.

The last maintained aggregate missing a streaming form: q259/q262
cover batch top-k state (insert merges, delete repairs); this runs
the same k-row-per-key state as a live stream — the pattern for
"current top spenders per account, updated as orders arrive".

State design (the 100 TB part): state per key is EXACTLY k
(value, id) pairs — two parallel arrays, O(k) per key regardless of
stream volume, the same bound as `operators/incremental.topk_state`.
Each micro-batch merges the batch's rows with the stored k and keeps
the top k under the UNIQUE total order (value DESC, id ASC) — the
id tiebreak makes emission deterministic, the suite-wide windowed-
query requirement. Keys untouched by a batch emit nothing (their
top-k is unchanged); touched keys re-emit their full current top-k,
which in append mode makes the memory-sink table a LOG of top-k
snapshots — with a single-file availableNow backlog (one micro
batch, the q88/q89 determinism argument) the log IS the final
answer, which is what the q270 oracle hashes.

Exactly-once/restart contract (pytest: tests/test_streaming_topk.py):
the checkpoint persists both the source offsets and the keyed state,
so a restart with new files processes ONLY the new data, merges into
the SURVIVING state, and re-emits exactly the merged top-k; a
restart with nothing new emits nothing. No timeouts and no
watermark: top-k over an append-only stream never evicts state by
time — state size is bounded by k per key, not by history.

Reference parity: the reference ranks per-patient model scores in
pandas (`nlargest`); this is that verb, maintained, on a stream.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TOPK_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("rank", LongType()),
        StructField("id", LongType()),
        StructField("value", DoubleType()),
    ]
)

TOPK_STATE_SCHEMA = StructType(
    [
        StructField("values", ArrayType(DoubleType())),
        StructField("ids", ArrayType(LongType())),
    ]
)


def make_topk_fn(k: int):
    """Build the per-key state function (k captured in closure)."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (key_val,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        pairs = list(zip(rows["value"].astype(float), rows["id"].astype(int)))
        if state.exists:
            values, ids = state.get
            pairs.extend(zip(list(values), list(ids)))
        # unique total order: value DESC, id ASC — ties are impossible
        # to mis-order, so emission is deterministic
        pairs.sort(key=lambda p: (-p[0], p[1]))
        top = pairs[:k]
        state.update((
            [float(v) for v, _ in top],
            [int(i) for _, i in top],
        ))
        yield pd.DataFrame(
            [
                (int(key_val), r + 1, int(i), float(v))
                for r, (v, i) in enumerate(top)
            ],
            columns=TOPK_OUTPUT_SCHEMA.fieldNames(),
        )

    return fn


def topk_stream(
    spark: SparkSession,
    source_dir: str,
    glob: str,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
    table_name: str = "stream_topk",
    checkpoint: str | None = None,
    sink_path: str | None = None,
) -> DataFrame:
    """Run maintained top-k over a parquet file stream (file source →
    applyInPandasWithState → availableNow → sink) and return the
    emitted snapshot log. `checkpoint` pins the checkpoint so a
    later call with MORE files in `source_dir` resumes the state and
    processes only the new data (the restart/replay test's surface);
    None lets Spark use a throwaway temp checkpoint.

    Sink: memory by default (single-run lanes — q270). The MEMORY
    sink cannot RECOVER from a checkpoint (Spark refuses restarts
    into it), so restartable callers pass `sink_path` and the
    emissions append to a parquet sink instead — its _spark_metadata
    commit log makes the emission history exactly-once across
    restarts; the returned frame then reads the CUMULATIVE log (each
    run's own emissions are the set difference vs the previous
    read — what tests/test_streaming_topk.py asserts)."""
    schema = spark.read.option("pathGlobFilter", glob).parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", glob)
        .load(source_dir)
    )
    # NULL semantics (r11 ADVICE): a row with a NULL key, value or id
    # cannot rank — no key to group on, no position in the (value
    # DESC, id ASC) total order — so it is EXCLUDED before the state
    # function, the same NULL-measure discipline as the batch
    # maintenance family (histogram_state, topk_state) and the q270
    # oracle's row_number. Without this the pandas worker would crash
    # on int(None)/astype(NaN) instead of defining the semantics.
    prepared = stream.select(
        F.col(key_col).cast("bigint").alias("key"),
        F.col(value_col).cast("double").alias("value"),
        F.col(id_col).cast("bigint").alias("id"),
    ).filter(
        F.col("key").isNotNull()
        & F.col("value").isNotNull()
        & F.col("id").isNotNull()
    )
    ranked = prepared.groupBy("key").applyInPandasWithState(
        make_topk_fn(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    if sink_path is not None:
        writer = (
            ranked.writeStream.format("parquet")
            .option("path", sink_path)
            .outputMode("append")
            .trigger(availableNow=True)
        )
    else:
        writer = (
            ranked.writeStream.format("memory")
            .queryName(table_name)
            .outputMode("append")
            .trigger(availableNow=True)
        )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    query = writer.start()
    query.awaitTermination()
    if sink_path is not None:
        return spark.read.schema(TOPK_OUTPUT_SCHEMA).parquet(sink_path)
    return spark.table(table_name)
