"""Streaming sinks: checkpointed foreachBatch → parquet.

The memory sink (tests) and console sink are toys; the production
lane for "stream lands in a queryable table" is foreachBatch with a
checkpoint: the checkpoint records the last committed micro-batch
id, so a restart resumes AFTER it — each input file is processed
exactly once even across crashes. Inside the batch function we are
in ordinary batch-DataFrame land, so the partitioned writer
(`sources/parquet_io.write_partitioned`) is reused as-is — one code
path for batch and streaming ingest.

Idempotence contract: foreachBatch can re-run a batch that committed
to the sink but not yet to the checkpoint (crash between the two).
Writing each batch to a `batch_id=N` subdirectory with overwrite
makes the replay harmless — the same data lands in the same place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Ingest the events feed into a parquet table via checkpointed
    foreachBatch (availableNow: drain the backlog, then stop).
    Restarting with the same checkpoint processes nothing new —
    exactly-once per input file."""
    from patientdataintegration_spark.streaming.events import _events_stream

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(f"{out_path}/batch_id={batch_id}")
        )

    return (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
