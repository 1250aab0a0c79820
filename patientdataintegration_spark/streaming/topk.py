"""Streaming maintained per-key TOP-K via `applyInPandasWithState`.

The last maintained aggregate missing a streaming form: q259/q262
cover batch top-k state (insert merges, delete repairs); this runs
the same k-row-per-key state as a live stream — the pattern for
"current top spenders per account, updated as orders arrive".

State design (the 100 TB part): state per key is EXACTLY k
(value, id) pairs — O(k) per key regardless of stream volume, the
same bound as `operators/incremental.topk_state`. Each micro-batch
merges the batch's rows with the stored k and keeps the top k under
the UNIQUE total order (value DESC, id ASC) — the id tiebreak makes
emission deterministic, the suite-wide windowed-query requirement.
Keys untouched by a batch emit nothing (their top-k is unchanged);
touched keys re-emit their full current top-k, which in append mode
makes the memory-sink table a LOG of top-k snapshots — with a
single-file availableNow backlog (one micro batch, the q88/q89
determinism argument) the log IS the final answer, which is what the
q270 oracle hashes.

KEY BUCKETING (r17 verdict item 5 — the per-key Python overhead was
the suite's most contention-sensitive cost): `applyInPandasWithState`
invokes the Python function ONCE PER GROUP per batch, so grouping by
the raw key paid ~|touched keys| interpreter round-trips (pandas
concat, list zips, a sort of ≤ 2k rows) per micro-batch — ~10k for
the q270 orders backlog. The stream instead groups by
`pmod(key, n_buckets)` (default 32, `spark.pdi.topk.buckets`): one
Python invocation per TOUCHED BUCKET handles all its keys
vectorized (one sort + groupby-head over the bucket's rows), cutting
invocations ~|keys|/n_buckets-fold while state stays O(k) per key —
the bucket state is the concatenation of its keys' k-row states
(parallel arrays), and ONLY keys present in the batch emit, so the
per-key emission contract (and therefore every oracle/restart
property) is unchanged. Shuffle volume is identical (same rows, one
hash key); skew is bounded by the unique-total-order cap: a bucket's
batch rows are ≤ its keys' rows either way.

Exactly-once/restart contract (pytest: tests/test_streaming_topk.py):
the checkpoint persists both the source offsets and the keyed state,
so a restart with new files processes ONLY the new data, merges into
the SURVIVING state, and re-emits exactly the merged top-k of the
touched keys; a restart with nothing new emits nothing. No timeouts
and no watermark: top-k over an append-only stream never evicts
state by time — state size is bounded by k per key, not by history.

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

# bucket state = the concatenation of the bucket's per-key k-row
# states as parallel arrays (key repeated per retained pair) — flat
# arrays, not a map, so the Arrow state round-trip stays columnar
TOPK_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(LongType())),
        StructField("values", ArrayType(DoubleType())),
        StructField("ids", ArrayType(LongType())),
    ]
)

_BUCKETS_CONF = "spark.pdi.topk.buckets"
_BUCKETS_DEFAULT = 32


def make_topk_fn(k: int):
    """Build the per-bucket state function (k captured in closure):
    merge the batch's rows with the bucket's stored per-key top-k,
    keep each key's top k under (value DESC, id ASC), emit the
    CURRENT top-k of exactly the keys present in the batch."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)[
            ["key", "value", "id"]
        ]
        touched = rows["key"].unique()
        if state.exists:
            keys, values, ids = state.get
            merged = pd.concat(
                [
                    rows,
                    pd.DataFrame(
                        {"key": keys, "value": values, "id": ids}
                    ),
                ],
                ignore_index=True,
            )
        else:
            merged = rows
        # unique total order per key: value DESC, id ASC — ties are
        # impossible to mis-order, so emission is deterministic
        merged = merged.sort_values(
            ["key", "value", "id"], ascending=[True, False, True]
        )
        top = merged.groupby("key", sort=True).head(k)
        state.update((
            [int(x) for x in top["key"]],
            [float(x) for x in top["value"]],
            [int(x) for x in top["id"]],
        ))
        out = top[top["key"].isin(touched)].copy()
        out["rank"] = out.groupby("key", sort=False).cumcount() + 1
        yield pd.DataFrame(
            {
                "key": out["key"].astype("int64"),
                "rank": out["rank"].astype("int64"),
                "id": out["id"].astype("int64"),
                "value": out["value"].astype("float64"),
            }
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
    try:
        n_buckets = int(
            spark.conf.get(_BUCKETS_CONF, str(_BUCKETS_DEFAULT))
        )
    except (TypeError, ValueError):
        n_buckets = _BUCKETS_DEFAULT
    n_buckets = max(1, n_buckets)
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
    # group by the key's BUCKET, not the key (module docstring): one
    # Python invocation per touched bucket, per-key logic vectorized
    # inside; pmod keeps negative keys in range
    ranked = (
        prepared.withColumn(
            "bucket", F.pmod(F.col("key"), F.lit(n_buckets)).cast("bigint")
        )
        .groupBy("bucket")
        .applyInPandasWithState(
            make_topk_fn(k),
            outputStructType=TOPK_OUTPUT_SCHEMA,
            stateStructType=TOPK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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
