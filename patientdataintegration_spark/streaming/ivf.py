"""The maintained IVF (ANN) index — build (q98) → extend (q252) →
retract (q276) — run as a STREAM: vector files arrive, each
micro-batch assigns the ingests against the FROZEN coarse quantizer
and applies op-tagged takedowns, advancing the persisted inverted
file under the streaming exactly-once machinery. With
`streaming/components.py` (dedup) and `streaming/index.py`
(retrieval), every maintained artifact in the engine now has a
streaming path.

Store layout — ROW-GRAIN generations, the dedup store's sigs rule
verbatim (`components.read_rowstore`): the inverted file's state is
plain per-vector rows, inserted by assignment and deleted by id —
no term-grain upserts (the index store) and no label algebra (the
dedup store). Under `store_dir`:

    centroids/                    the frozen coarse quantizer —
                                  OUTSIDE the generations: centroids
                                  never move (the q252/q276
                                  contract), so they are written once
                                  at seed and survive every GC
    base_g{G}/assigned/           inverted-file snapshots: the seed
                                  (G=0) and periodic compactions
    delta_g{g}/assigned/          batch g's newly-assigned rows
    delta_g{g}/tombs/             batch g's vector takedowns —
                                  written LAST (even when empty), so
                                  it is the generation's COMMIT
                                  MARKER: reads skip a crash-partial
                                  generation until replay overwrites
                                  it (r13 ADVICE)

Reconstruction: base ∖ tombstoned ids ∪ delta rows above their id's
latest tombstone — same-batch ingest+takedown dies, later re-ingest
lives (`components._reconstruct_rowstore`). The corpus-sized base
streams once behind broadcast probes; everything else is delta-sized.

The per-batch cost is the striking part: because centroids are frozen
and assignment is a pure per-row argmin, the insert path never reads
the old state AT ALL — each batch is one broadcast map job over its
own rows (O(|Δ| × n_cells)) plus two delta-sized writes. Takedowns
write tombstone ids only; the retraction semantics live entirely in
the read rule (`retract_ivf`'s anti-join, applied lazily at every
read instead of eagerly at write). Emptied cells keep their centroid
and serve zero rows — search-after-maintenance is bit-identical to a
rebuild over the net corpus against the same frozen quantizer, which
is what q284's oracle proves.

COMPACTION/GC: the dedup store's retention rule (fold every
`compact_every` batches, keep the newest two bases + deltas above
the older kept base), so `components.store_disk_report` audits this
store unchanged.

Exactly-once: batch `batch_id` writes generation `batch_id + 1` by
overwrite — idempotent under checkpoint replay, identical to the
other two streams.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from patientdataintegration_spark.streaming.components import (
    _base_path,
    _delta_path,
    commit_base,
    gc_generations,
    latest_generation,
    read_rowstore,
)

CENTROID_SCHEMA = "cell bigint, centroid array<double>"


def seed_ivf_store(
    assigned_init: DataFrame, centroids: DataFrame, store_dir: str
) -> None:
    """Write generation 0 of the inverted file plus the FROZEN
    centroid table (outside the generations — it never changes and
    must survive GC)."""
    centroids.write.mode("overwrite").parquet(
        os.path.join(store_dir, "centroids")
    )
    assigned_init.write.mode("overwrite").parquet(
        _base_path(store_dir, 0, "assigned")
    )
    # sentinel strictly last — a crash anywhere above leaves an
    # unseeded-looking store that fails loudly, never a torn seed
    commit_base(store_dir, 0)


def read_ivf_centroids(spark: SparkSession, store_dir: str) -> DataFrame:
    """The frozen coarse quantizer the store was seeded with."""
    return spark.read.schema(CENTROID_SCHEMA).parquet(
        os.path.join(store_dir, "centroids")
    )


def _compact_ivf(spark: SparkSession, store_dir: str, gen: int) -> None:
    """Fold retained generations into a full base_g{gen} snapshot of
    the inverted file, then GC with the shared retention rule (keep
    the newest two bases + deltas above the older kept base). The
    centroid table lives outside the generations and is untouched."""
    folded = read_rowstore(
        spark, store_dir, "assigned", version=gen, id_col="neighbor_id",
        marker="tombs",
    )
    folded.write.mode("overwrite").parquet(
        _base_path(store_dir, gen, "assigned")
    )
    commit_base(store_dir, gen)  # marker-last (r14 ADVICE)
    gc_generations(store_dir)


def compact_ivf_store(spark: SparkSession, store_dir: str) -> int:
    """Compaction as a SCHEDULED MAINTENANCE JOB for the IVF store —
    `components.compact_store`'s contract (fold at the latest
    committed generation outside the ingest hot path, no-op when that
    generation already has a base, GC keeps the replay window).
    Returns the folded generation."""
    from patientdataintegration_spark.streaming.components import _scan_gens

    gen = latest_generation(store_dir, marker="tombs")
    bases, _deltas = _scan_gens(store_dir)
    if gen in bases:
        return gen
    _compact_ivf(spark, store_dir, gen)
    return gen


def ivf_stream(
    spark: SparkSession,
    source_dir: str,
    glob: str,
    store_dir: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    op_col: str | None = None,
    compact_every: int = 16,
) -> DataFrame:
    """Drain the vector file stream under `availableNow`, maintaining
    the seeded inverted file one micro-batch at a time, and return
    the FINAL maintained `assigned` relation (feed it to
    `ivf_search`). Call again after new files land (same checkpoint):
    only the new files process — the q270/q273/q283 restart pattern.

    Per batch: op > 0 rows assign against the frozen centroids
    (`ivf_assign` — one broadcast map job over the batch, the old
    state is never read) and land as `delta_g{batch+1}/assigned`;
    op < 0 rows write their ids to `delta_g{batch+1}/tombs`
    (vector columns may be NULL — only the id matters), applied by
    the read rule's anti-join semantics. Without `op_col` every row
    ingests. Every `compact_every` batches the generations fold and
    GC (`_compact_ivf`)."""
    from patientdataintegration_spark.operators.similarity import ivf_assign

    latest_generation(store_dir)  # fail fast on an unseeded store

    vec_schema = (
        spark.read.option("pathGlobFilter", glob).parquet(source_dir).schema
    )

    def advance(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        g = int(batch_id) + 1
        if op_col is not None:
            deleted = (
                batch.filter(F.col(op_col) < 0)
                .select(F.col(id_col).cast("bigint").alias("neighbor_id"))
                .distinct()
            )
            ingest = batch.filter(F.col(op_col) > 0).drop(op_col)
        else:
            deleted = batch.select(
                F.col(id_col).cast("bigint").alias("neighbor_id")
            ).filter(F.lit(False))
            ingest = batch
        cent = read_ivf_centroids(s, store_dir)
        assigned_delta = ivf_assign(ingest, cent, id_col, vec_col)
        # one generation per batch, overwrite = replay-idempotent
        assigned_delta.write.mode("overwrite").parquet(
            _delta_path(store_dir, g, "assigned")
        )
        deleted.write.mode("overwrite").parquet(
            _delta_path(store_dir, g, "tombs")
        )
        if compact_every and g % compact_every == 0:
            _compact_ivf(s, store_dir, g)

    stream = (
        spark.readStream.schema(vec_schema)
        .format("parquet")
        .option("pathGlobFilter", glob)
        .load(source_dir)
    )
    query = (
        stream.writeStream.foreachBatch(advance)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return read_rowstore(
        spark, store_dir, "assigned", id_col="neighbor_id", marker="tombs"
    )
