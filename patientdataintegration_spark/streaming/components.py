"""The maintained dedup loop — pairs (q263) → components (q268) —
run as a STREAM: MinHash-signature deltas arrive as files, and each
micro-batch advances the persisted (signatures, pairs, labels) state
through `maintain_lsh_pairs` + `maintain_components`, so the whole
nightly dedup pipeline sits under the streaming exactly-once
machinery (the r11 verdict's stretch 6).

Why `foreachBatch` and not a stateful operator: the dedup state is
three RELATIONS (the signature store, the candidate-pair view, the
label table), maintained by joins against the batch — exactly the
shape `foreachBatch` exists for (arbitrary batch logic over
exactly-once micro-batches), and nothing like the per-key k-row
state `applyInPandasWithState` models (q270). The 100 TB deployment
is the same code: the stores are parquet/Delta tables, each batch
touches O(|Δ|) of them (the q263/q268 cost arguments), and the
checkpoint guarantees a crashed batch re-runs.

Exactly-once across restarts: the source offsets live in the
checkpoint, and every batch writes its outputs to VERSIONED store
directories keyed by `batch_id` (read version = batch_id, write
version = batch_id + 1). A replayed batch re-reads the same inputs
and OVERWRITES the same version — idempotent, the standard
foreachBatch discipline — so state never double-applies a delta.
The final state is the highest version present.

The stream is full-CRUD when an `op_col` is declared: op > 0 rows
ingest signatures, op < 0 rows are TAKEDOWNS, applied after the
batch's inserts through the q272 retraction machinery (pair-view
anti-joins + cluster-local label repair) — so GDPR erasure rides
the same exactly-once micro-batches as ingest (q275).

Determinism for the q273 oracle: each `availableNow` run processes
the files that appeared since the last run as ONE micro-batch (the
q270/q88 argument), so a fixed file-arrival schedule yields a fixed
batch sequence, and maintenance == full recompute (the q268
equivalence, applied inductively per batch) makes the final labels
hash-equal to the batch q115 transitive closure over the complete
corpus — restart/replay convergence is pinned by
tests/test_streaming_components.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

LABEL_SCHEMA = "node bigint, label bigint"
PAIR_SCHEMA = "doc_a bigint, doc_b bigint"


def _store(store_dir: str, name: str, version: int) -> str:
    return os.path.join(store_dir, f"{name}_v{version}")


def _latest_version(store_dir: str, name: str) -> int:
    best = -1
    try:
        entries = os.listdir(store_dir)
    except OSError:
        return best
    for entry in entries:
        if entry.startswith(f"{name}_v"):
            try:
                best = max(best, int(entry[len(name) + 2 :]))
            except ValueError:
                continue
    return best


def seed_stores(
    sigs_init: DataFrame, pairs_init: DataFrame, labels_init: DataFrame,
    store_dir: str,
) -> None:
    """Write generation 0 of the three dedup stores (the persisted
    corpus the stream maintains)."""
    sigs_init.write.mode("overwrite").parquet(_store(store_dir, "sigs", 0))
    pairs_init.write.mode("overwrite").parquet(_store(store_dir, "pairs", 0))
    labels_init.write.mode("overwrite").parquet(_store(store_dir, "labels", 0))


def components_stream(
    spark: SparkSession,
    source_dir: str,
    glob: str,
    store_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    op_col: str | None = None,
) -> DataFrame:
    """Drain the signature-delta file stream under `availableNow`,
    maintaining the seeded stores one micro-batch at a time, and
    return the FINAL label table. Call again after new files land
    (same checkpoint): only the new files process, against the
    surviving state — the q270 restart pattern.

    Per batch (all delta-sized work, the q263/q268 cost model):
    bipartite-band the batch against the signature store plus
    within-batch banding -> the delta edge set; append the new pairs
    to the pair view; contract the delta through the old labels and
    star-relabel (`maintain_components`); append the batch's
    signatures to the store. The old PAIR view is read only to be
    appended to — never re-banded, never re-joined.

    With `op_col` the stream is full-CRUD CDC: a batch row with
    op > 0 is a signature INGEST, op < 0 a document TAKEDOWN (its
    signature columns may be NULL — only the id matters). Within a
    batch, inserts apply first, takedowns second (a doc ingested and
    taken down in one batch ends deleted — last-writer order fixed
    by definition, not arrival), and the takedown runs the q272
    machinery against the post-insert state: `retract_lsh_pairs` on
    the pair view, `retract_documents`' cluster-local star repair on
    the labels, one anti-join on the signature store. A doc id taken
    down and re-ingested in a LATER batch is simply a new document.
    Every step preserves the store invariant labels_v =
    star(pairs_v), which is exactly what the retraction's
    dirty-cluster logic requires."""
    from patientdataintegration_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_bipartite,
        maintain_components,
        retract_documents,
        retract_lsh_pairs,
    )
    from pyspark.sql import functions as F

    # the source files' own schema (they carry op_col in CRUD mode;
    # the seeded signature store does not)
    sig_schema = (
        spark.read.option("pathGlobFilter", glob).parquet(source_dir).schema
    )

    def advance(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        v = int(batch_id)
        sigs_old = s.read.parquet(_store(store_dir, "sigs", v))
        pairs_old = s.read.parquet(_store(store_dir, "pairs", v))
        labels_old = s.read.parquet(_store(store_dir, "labels", v))
        if op_col is not None:
            deleted = (
                batch.filter(F.col(op_col) < 0)
                .select(F.col(id_col))
                .distinct()
                .localCheckpoint()  # three retraction consumers
            )
            ingest = batch.filter(F.col(op_col) > 0).drop(op_col)
        else:
            deleted = None
            ingest = batch
        # the ingest feeds three consumers (bipartite, within, store
        # append): freeze once, delta-sized
        sigs_delta = ingest.localCheckpoint()
        cross = lsh_candidate_pairs_bipartite(
            sigs_old, sigs_delta, id_col=id_col, bands=bands,
            rows_per_band=rows_per_band,
        ).select(
            F.least("left_id", "right_id").alias("doc_a"),
            F.greatest("left_id", "right_id").alias("doc_b"),
        )
        within = lsh_candidate_pairs(
            sigs_delta, id_col=id_col, bands=bands,
            rows_per_band=rows_per_band,
        ).select("doc_a", "doc_b")
        delta_edges = cross.unionByName(within).localCheckpoint()
        labels_new = maintain_components(labels_old, delta_edges)
        pairs_new = pairs_old.unionByName(delta_edges)
        sigs_new = sigs_old.unionByName(sigs_delta)
        if deleted is not None and not deleted.isEmpty():
            # takedowns after inserts: retraction needs the labels =
            # star(pairs) invariant, so freeze the post-insert state
            pairs_new = pairs_new.localCheckpoint()
            labels_new = retract_documents(
                pairs_new,
                labels_new.localCheckpoint(),
                deleted,
                id_col=id_col,
            )
            pairs_new = retract_lsh_pairs(pairs_new, deleted, id_col=id_col)
            sigs_new = sigs_new.join(
                F.broadcast(deleted), id_col, "left_anti"
            )
        # versioned writes: a replayed batch overwrites its own
        # generation — idempotent under the checkpoint's replay
        labels_new.write.mode("overwrite").parquet(
            _store(store_dir, "labels", v + 1)
        )
        pairs_new.write.mode("overwrite").parquet(
            _store(store_dir, "pairs", v + 1)
        )
        sigs_new.write.mode("overwrite").parquet(
            _store(store_dir, "sigs", v + 1)
        )

    stream = (
        spark.readStream.schema(sig_schema)
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
    final = _latest_version(store_dir, "labels")
    return spark.read.schema(LABEL_SCHEMA).parquet(
        _store(store_dir, "labels", final)
    )
