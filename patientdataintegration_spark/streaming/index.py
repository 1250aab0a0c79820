"""The maintained inverted index — build (q110) → extend (q281) →
retract (q277) — run as a STREAM: raw document files arrive, and each
micro-batch advances the persisted (index, overflow) factorization
through `extend_inverted_index_delta` + `retract_inverted_index_delta`
under the streaming exactly-once machinery — the q273/q275 treatment
applied to the retrieval store, so EVERY maintained artifact in the
engine now has a streaming path.

Why `foreachBatch`: same argument as `streaming/components.py` — the
state is two RELATIONS maintained by joins against the batch, not
per-key k-row state.

Store layout — TERM-GRAIN UPSERT GENERATIONS. The dedup store's
row-grain rules (insert rows, tombstone ids) don't fit the index: a
maintenance verb REPLACES a dirty term's entire state (its postings
array, its overflow rows — re-ranked, re-capped), so the natural
delta is a keyed whole-row upsert. Under `store_dir`:

    base_g{G}/{index,overflow}/   full snapshots: the seed (G=0) and
                                  periodic compactions
    delta_g{g}/terms/             batch g's DIRTY TERM set — every
                                  term whose state gen g rewrote
    delta_g{g}/index/             those terms' repaired index rows
    delta_g{g}/overflow/          those terms' repaired overflow rows

A dirty term ABSENT from a generation's index rows left the index in
that generation (lost its last posting) — dirty + absent = delete, so
no separate tombstone relation is needed at term grain.

Reconstruction at version v (`read_index_store`): per term,
LAST-WRITER-WINS at generation grain — base rows pass through behind
one broadcast anti on the union of retained dirty-term sets
(delta-sized); delta rows survive iff their generation IS the term's
latest touching generation. Both relations follow the same rule; the
corpus-sized base streams once, every other input is delta-sized.

Per-batch write volume is O(dirty terms' rows) — the batch's terms
plus the takedown's touched terms — matching the batch's COMPUTE
(the q281/q277 delta-cost arguments), never the vocabulary.

COMPACTION/GC: identical rule to the dedup store (fold retained
deltas into a new base every `compact_every` batches; keep the newest
two bases + deltas above the older kept base), so
`streaming/components.store_disk_report` audits this store unchanged.

Exactly-once across restarts: batch `batch_id` writes generation
`batch_id + 1` by OVERWRITE — a replayed batch re-reads state at
version `batch_id` (its own generation is above that version, hence
invisible) and rewrites the same delta partition idempotently.

CRUD: with `op_col`, op > 0 rows are document INGESTS, op < 0 rows
TAKEDOWNS (text may be NULL — only the id matters). Inserts apply
first, takedowns second against the post-insert state (composed
lazily), so a same-batch ingest+takedown ends deleted — the order is
definitional, fixed by the q275 convention. The two verbs' dirty
sets merge into ONE net generation: terms the takedown re-repaired
take the post-takedown rows; insert-only terms keep the post-insert
rows.

The maintained store keeps **min_df=1** (every term): build-time
min_df drops are unrecoverable under inserts (`extend_inverted_index`
refuses them), so min_df is the READER's doc_freq filter — the exact
equivalent, since the cap ranks within a term independently of the
term filter (proven by q281's oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from patientdataintegration_spark.streaming.components import (
    _base_path,
    _delta_path,
    _resolve,
    gc_generations,
    latest_generation,
)

INDEX_SCHEMA = "term string, doc_freq bigint, postings array<bigint>"
OVERFLOW_SCHEMA = "term string, doc bigint"
_TERM_SCHEMA = "term string"


def seed_index_store(
    index_init: DataFrame, overflow_init: DataFrame, store_dir: str
) -> None:
    """Write generation 0 of the (index, overflow) factorization —
    the persisted store the stream maintains — as the first base
    snapshot. Build it with min_df=1 (module docstring)."""
    index_init.write.mode("overwrite").parquet(
        _base_path(store_dir, 0, "index")
    )
    overflow_init.write.mode("overwrite").parquet(
        _base_path(store_dir, 0, "overflow")
    )


def _read_upserts(
    spark: SparkSession,
    store_dir: str,
    name: str,
    schema: str,
    gens: list[int],
) -> tuple[DataFrame | None, DataFrame | None]:
    """(touched terms with their latest touching generation, upsert
    rows stamped `_gen`) across the retained generations — the two
    delta-sized inputs of the last-writer-wins reconstruction."""
    touched: DataFrame | None = None
    rows: DataFrame | None = None
    for g in gens:
        t = spark.read.schema(_TERM_SCHEMA).parquet(
            _delta_path(store_dir, g, "terms")
        ).withColumn("_gen", F.lit(g).cast("bigint"))
        touched = t if touched is None else touched.unionByName(t)
        r = spark.read.schema(schema).parquet(
            _delta_path(store_dir, g, name)
        ).withColumn("_gen", F.lit(g).cast("bigint"))
        rows = r if rows is None else rows.unionByName(r)
    if touched is not None:
        touched = touched.groupBy("term").agg(F.max("_gen").alias("_lg"))
    return touched, rows


def read_index_store(
    spark: SparkSession,
    store_dir: str,
    name: str,
    version: int | None = None,
) -> DataFrame:
    """Reconstruct one of the maintained relations ("index",
    "overflow") at `version` (default: latest): base rows pass
    through behind one broadcast anti on the retained dirty-term
    union; delta rows survive iff their generation is the term's
    LATEST touching generation (term-grain last-writer-wins — a term
    absent from its latest generation's rows left the index)."""
    if name not in ("index", "overflow"):
        raise ValueError(f"unknown store relation {name!r} (index/overflow)")
    schema = INDEX_SCHEMA if name == "index" else OVERFLOW_SCHEMA
    version, base, gens = _resolve(store_dir, version)
    base_df = spark.read.schema(schema).parquet(
        _base_path(store_dir, base, name)
    )
    touched, rows = _read_upserts(spark, store_dir, name, schema, gens)
    if touched is None:
        return base_df
    out = base_df.join(
        F.broadcast(touched.select("term")), "term", "left_anti"
    )
    if rows is not None:
        latest_rows = (
            rows.join(F.broadcast(touched), "term")
            .filter(F.col("_gen") == F.col("_lg"))
            .drop("_gen", "_lg")
        )
        out = out.unionByName(latest_rows)
    return out


def _compact_index(spark: SparkSession, store_dir: str, gen: int) -> None:
    """Fold the retained upsert generations into a full base_g{gen}
    snapshot, then GC with the dedup store's exact retention rule:
    keep the newest TWO bases (a replayed in-flight batch reads state
    gen-1, which needs the previous base) and the deltas above the
    OLDER kept base."""
    # pin both reconstructions before the first write (the _compact
    # ordering hazard: once base_g{gen}/index exists, a fresh _resolve
    # at `gen` would pick the half-written base for the other side)
    folded = {
        name: read_index_store(spark, store_dir, name, version=gen)
        for name in ("index", "overflow")
    }
    for name, df in folded.items():
        df.write.mode("overwrite").parquet(_base_path(store_dir, gen, name))
    gc_generations(store_dir)


def index_stream(
    spark: SparkSession,
    source_dir: str,
    glob: str,
    store_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str | None = None,
    max_postings: int | None = 16,
    compact_every: int = 16,
) -> DataFrame:
    """Drain the document file stream under `availableNow`,
    maintaining the seeded (index, overflow) store one micro-batch at
    a time, and return the FINAL maintained index. Call again after
    new files land (same checkpoint): only the new files process,
    against the surviving state — the q270/q273 restart pattern.

    Per batch: `extend_inverted_index_delta` over the op > 0 rows
    (dirty terms = the batch's vocabulary, broadcast; repair shuffle
    = those terms' rows), then — CRUD mode — `retract_inverted_
    index_delta` over the op < 0 ids against the POST-INSERT state
    (composed lazily: store ∖ insert-dirty ∪ insert rows, never
    materialized vocabulary-wide), so a same-batch ingest+takedown
    ends deleted. The two dirty sets merge into one net term-grain
    upsert generation (takedown-repaired terms win); writes are
    O(dirty terms' rows). Every `compact_every` batches the deltas
    fold into a new base and old generations GC (`_compact_index`),
    bounding read fan-in and disk
    (`streaming/components.store_disk_report`)."""
    from patientdataintegration_spark.operators.indexing import (
        extend_inverted_index_delta,
        retract_inverted_index_delta,
    )

    # fail fast (and descriptively) on an unseeded store rather than
    # inside the first micro-batch
    latest_generation(store_dir)

    doc_schema = (
        spark.read.option("pathGlobFilter", glob).parquet(source_dir).schema
    )

    def advance(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        v = int(batch_id)
        g = v + 1
        index_old = read_index_store(s, store_dir, "index", version=v)
        overflow_old = read_index_store(s, store_dir, "overflow", version=v)
        if op_col is not None:
            deleted = (
                batch.filter(F.col(op_col) < 0)
                .select(F.col(id_col))
                .distinct()
            )
            ingest = batch.filter(F.col(op_col) > 0).drop(op_col)
        else:
            deleted = None
            ingest = batch
        d1, i1, o1 = extend_inverted_index_delta(
            index_old, overflow_old, ingest,
            max_postings=max_postings, text_col=text_col, id_col=id_col,
        )
        if deleted is not None and not deleted.isEmpty():
            # takedowns after inserts, against the post-insert state
            # composed lazily from the old store + the insert delta
            postins_index = index_old.join(
                F.broadcast(d1), "term", "left_anti"
            ).unionByName(i1)
            postins_overflow = overflow_old.join(
                F.broadcast(d1), "term", "left_anti"
            ).unionByName(o1)
            d2, i2, o2 = retract_inverted_index_delta(
                postins_index, postins_overflow, deleted,
                min_df=1, max_postings=max_postings, id_col=id_col,
            )
            # net generation: takedown-repaired terms win; insert-only
            # terms keep the post-insert rows
            dirty = d1.unionByName(d2).distinct()
            index_rows = i2.unionByName(
                i1.join(F.broadcast(d2), "term", "left_anti")
            )
            overflow_rows = o2.unionByName(
                o1.join(F.broadcast(d2), "term", "left_anti")
            )
        else:
            dirty, index_rows, overflow_rows = d1, i1, o1
        # one upsert generation per batch: a replayed batch overwrites
        # its own generation — idempotent under checkpoint replay
        dirty.select("term").write.mode("overwrite").parquet(
            _delta_path(store_dir, g, "terms")
        )
        index_rows.select("term", "doc_freq", "postings").write.mode(
            "overwrite"
        ).parquet(_delta_path(store_dir, g, "index"))
        overflow_rows.select("term", "doc").write.mode("overwrite").parquet(
            _delta_path(store_dir, g, "overflow")
        )
        if compact_every and g % compact_every == 0:
            _compact_index(s, store_dir, g)

    stream = (
        spark.readStream.schema(doc_schema)
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
    return read_index_store(spark, store_dir, "index")
