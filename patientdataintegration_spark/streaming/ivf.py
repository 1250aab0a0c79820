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
    commit_delta,
    gc_generations,
    latest_generation,
    parallel_actions,
    parallel_writes,
    read_rowstore,
    uncommit_delta,
)

CENTROID_SCHEMA = "cell bigint, centroid array<double>"
ASSIGNED_SCHEMA = (
    "neighbor_id bigint, c_vec array<double>, c_norm double, cell bigint"
)
# the serving export's delete-file side relation: (id, latest
# tombstone generation) — `components._tombs_by_id`'s shape
TOMB_SCHEMA = "neighbor_id bigint, _tg bigint"


def seed_ivf_store(
    assigned_init: DataFrame, centroids: DataFrame, store_dir: str
) -> None:
    """Write generation 0 of the inverted file plus the FROZEN
    centroid table (outside the generations — it never changes and
    must survive GC)."""
    parallel_writes([
        (centroids, os.path.join(store_dir, "centroids")),
        (assigned_init, _base_path(store_dir, 0, "assigned")),
    ])
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


def export_ivf_serving_layout(
    spark: SparkSession,
    store_dir: str,
    out_dir: str,
    version: int | None = None,
    keep_old_versions: int = 0,
) -> int:
    """Export the maintained inverted file into a SERVING-OPTIMIZED
    layout (r14 verdict item 3 — the q290 treatment applied to the
    ANN store): the `assigned` relation hive-partitioned by its
    natural serving key, the PROBE CELL, with the (tiny) centroid
    table copied alongside as the driver-side planner input — a
    query vector maps to its n_probe cells without touching the
    cluster (`ivf_probe_cells_py`, `term_bucket_py`'s geometric
    twin), and the scan then reads ONLY those cells' partitions:
    |probe cells| / n_cells of the store per query batch, pruned at
    plan time, instead of streaming the whole inverted file behind
    the broadcast probe join.

    Pins one committed store version and records it in an atomically-
    flipped meta file (the `export_serving_layout` staleness/commit
    contract verbatim). The layout is MERGE-ON-READ refreshable
    (`refresh_ivf_serving_layout`): every exported row carries its
    assignment generation `_gen` (a full export folds the whole state,
    so all rows take the exported version), and a delta-sized
    `tombs_v{V}` side relation (empty at full export) records
    (neighbor_id, latest tombstone generation) pairs the pruned read
    anti-applies with the store's own liveness rule — the
    Iceberg/Hudi delete-file pattern, so a refresh never has to FIND
    a tombstoned id's cell partition. Returns the exported
    version."""
    from patientdataintegration_spark.streaming.components import _resolve

    version, _base, _gens = _resolve(store_dir, version, marker="tombs")
    # staged, version-tagged relation dirs + atomic meta flip (r15
    # ADVICE): a full export — including the GC-triggered fallback
    # `refresh_ivf_serving_layout` can fire INLINE from a live stream
    # — must never static-overwrite the directory the old meta
    # serves. A crash mid-export leaves the old meta pointing at
    # intact old dirs; orphan staging dirs from a crashed attempt are
    # overwritten by the retry (same version → same name) and GC'd
    # after the next successful flip.
    assigned_rel = f"assigned_v{version}"
    cent_rel = f"centroids_v{version}"
    tombs_rel = f"tombs_v{version}"
    # the directories the PRE-FLIP meta references, retained by
    # reference when keep_old_versions >= 1 (r16 ADVICE — see
    # index._gc_versioned_dirs)
    prev_refs: tuple[str, ...] = ()
    if os.path.isfile(os.path.join(out_dir, "serving_meta.json")):
        old_meta = _read_ivf_serving_meta(out_dir)
        prev_refs = tuple(
            old_meta[k]
            for k in ("assigned", "centroids", "tombs")
            if k in old_meta
        )
    assigned = read_rowstore(
        spark, store_dir, "assigned", version=version,
        id_col="neighbor_id", marker="tombs",
    ).withColumn("_gen", F.lit(int(version)).cast("int"))
    # staged writes are independent (the meta flip publishes them) —
    # run them concurrently (guide §2.6)
    parallel_writes([
        (assigned, os.path.join(out_dir, assigned_rel), ("cell",)),
        (
            read_ivf_centroids(spark, store_dir),
            os.path.join(out_dir, cent_rel),
        ),
        (
            spark.createDataFrame([], TOMB_SCHEMA),
            os.path.join(out_dir, tombs_rel),
        ),
    ])
    _write_ivf_serving_meta(
        out_dir,
        {
            "version": version,
            "tombs": tombs_rel,
            "assigned": assigned_rel,
            "centroids": cent_rel,
        },
    )
    # GC everything outside the retention window: older version-
    # tagged dirs beyond keep_old_versions, pre-versioning legacy
    # names when the window is 0 (`index._gc_versioned_dirs` — one
    # retention discipline for every serving layout)
    from patientdataintegration_spark.streaming.index import (
        _gc_versioned_dirs,
    )

    _gc_versioned_dirs(
        out_dir,
        prefixes=("assigned", "centroids", "tombs"),
        current_version=version,
        keep_old_versions=keep_old_versions,
        legacy=("assigned", "centroids"),
        protect=prev_refs if keep_old_versions >= 1 else (),
    )
    return version


def _write_ivf_serving_meta(out_dir: str, meta: dict) -> None:
    """Atomic meta flip — `index._write_serving_meta` verbatim (one
    flip discipline for every serving layout, not two copies)."""
    from patientdataintegration_spark.streaming.index import (
        _write_serving_meta,
    )

    _write_serving_meta(out_dir, meta)


def _read_ivf_serving_meta(out_dir: str) -> dict:
    from patientdataintegration_spark.streaming.index import (
        _read_serving_meta,
    )

    return _read_serving_meta(out_dir)


def refresh_ivf_serving_layout(
    spark: SparkSession,
    store_dir: str,
    out_dir: str,
    version: int | None = None,
    keep_old_versions: int = 0,
) -> dict:
    """INCREMENTAL refresh of an exported IVF serving layout — the
    serving tier's last full-scan cost (`refresh_serving_layout`'s
    row-grain twin): a full re-export rewrites every cell partition
    even when one maintenance window touched a handful of vectors.
    The store's deltas already say exactly what changed, so a refresh
    from the exported version v_exp to the committed version v_new:

    - live inserts = the range's delta `assigned` rows above their
      id's latest in-range tombstone (the store's same-batch-dies
      rule) — delta-sized; their cell set collects DRIVER-SIDE
      (≤ n_cells ints, the rewrite's planner input);
    - those cells rewrite by DYNAMIC partition overwrite: the cell's
      old exported rows (read PRUNED, minus rows killed by the new
      tombstones, minus exact (id, _gen) replay duplicates) ∪ the
      live inserts carrying their true generation;
    - takedowns never hunt for their victim's partition: the range's
      (id, latest tomb gen) pairs MERGE into the delta-sized tombs
      side relation (per-id max — idempotent), written to a fresh
      `tombs_v{v_new}` so a crash never truncates the live one; the
      pruned read applies them with the store's liveness rule
      (`_tg < _gen` keeps re-inserts above their tombstone alive,
      exactly `components._reconstruct_rowstore`).

    Refresh cost is O(inserted rows + their cells' rows + tombstone
    ids) — the maintenance window's size, never the inverted file's.
    If any needed generation was already folded and GC'd, the diff is
    unknowable and the refresh FALLS BACK to a full re-export at
    v_new (which also resets the tombs relation to empty — the
    natural fold point, compaction-aligned). The meta version flips
    atomically after the last data write. Returns {"version",
    "mode": "noop"|"incremental"|"full", "dirty_cells"}."""
    import shutil

    from patientdataintegration_spark.streaming.components import (
        _scan_gens,
        _tombs_by_id,
    )

    meta = _read_ivf_serving_meta(out_dir)
    v_exp = int(meta["version"])
    from patientdataintegration_spark.streaming.components import _resolve

    v_new, _base, _gens = _resolve(store_dir, version, marker="tombs")
    if v_new < v_exp:
        raise ValueError(
            f"IVF serving layout at {out_dir!r} is at version {v_exp}, "
            f"ahead of the requested store version {v_new} — a refresh "
            "only moves forward; export a historical version to a fresh "
            "directory"
        )
    if v_new == v_exp:
        return {"version": v_exp, "mode": "noop", "dirty_cells": []}
    needed = list(range(v_exp + 1, v_new + 1))
    _bases, committed = _scan_gens(store_dir, marker="tombs")
    if not set(needed) <= set(committed):
        export_ivf_serving_layout(
            spark, store_dir, out_dir, version=v_new,
            keep_old_versions=keep_old_versions,
        )
        return {"version": v_new, "mode": "full", "dirty_cells": None}

    inserts: DataFrame | None = None
    for g in needed:
        d = spark.read.schema(ASSIGNED_SCHEMA).parquet(
            _delta_path(store_dir, g, "assigned")
        ).withColumn("_gen", F.lit(int(g)).cast("int"))
        inserts = d if inserts is None else inserts.unionByName(d)
    new_tombs = _tombs_by_id(spark, store_dir, needed, "neighbor_id")
    live = (
        inserts.join(F.broadcast(new_tombs), "neighbor_id", "left")
        .filter(F.col("_tg").isNull() | (F.col("_tg") < F.col("_gen")))
        .drop("_tg")
        # consumers: the cell collect, the replay anti-join, the union
        .localCheckpoint()
    )
    dirty = sorted(
        r["cell"] for r in live.select("cell").distinct().collect()
    )
    if dirty:
        kept = (
            _read_ivf_export(spark, out_dir)
            .filter(F.col("cell").isin(dirty))
            .join(F.broadcast(new_tombs), "neighbor_id", "left")
            .filter(F.col("_tg").isNull() | (F.col("_tg") < F.col("_gen")))
            .drop("_tg")
            # checkpoint-replayed batches re-land identical (id, gen)
            # rows; exact-pair anti keeps the rewrite idempotent
            # without collapsing the store's legitimate duplicates
            .join(
                F.broadcast(live.select("neighbor_id", "_gen")),
                ["neighbor_id", "_gen"],
                "left_anti",
            )
        )
        # materialize BEFORE the overwrite: the plan reads the very
        # partitions the write replaces. No emptied-cell deletion pass
        # (unlike the index twin, where a dirty bucket's terms can all
        # vanish): a cell is dirty only because a live insert lands in
        # it, so every rewritten partition is non-empty by construction
        content = kept.unionByName(live).localCheckpoint()
    old_rel = meta["tombs"]
    merged = (
        spark.read.schema(TOMB_SCHEMA)
        .parquet(os.path.join(out_dir, old_rel))
        .unionByName(new_tombs)
        .groupBy("neighbor_id")
        .agg(F.max("_tg").alias("_tg"))
    )
    new_rel = f"tombs_v{v_new}"
    # the cell rewrite and the delete-file fold are independent (the
    # meta flip below is the single publish point) — overlap them
    # (guide §2.6)
    wjobs = [
        lambda: merged.write.mode("overwrite").parquet(
            os.path.join(out_dir, new_rel)
        )
    ]
    if dirty:
        wjobs.append(
            lambda: content.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("cell").parquet(
                os.path.join(out_dir, meta.get("assigned", "assigned"))
            )
        )
    parallel_actions(wjobs)
    _write_ivf_serving_meta(out_dir, {**meta, "version": v_new, "tombs": new_rel})
    from patientdataintegration_spark.streaming.index import (
        _gc_versioned_dirs,
    )

    _gc_versioned_dirs(
        out_dir,
        prefixes=("tombs",),
        current_version=v_new,
        keep_old_versions=keep_old_versions,
        # retain the PRE-FLIP meta's tombs by reference (r16 ADVICE)
        protect=(old_rel,) if keep_old_versions >= 1 else (),
    )
    return {"version": v_new, "mode": "incremental", "dirty_cells": dirty}


def ivf_probe_cells_py(
    query_vecs: list[list[float]],
    centroids: list[tuple[int, list[float]]],
    n_probe: int,
) -> list[int]:
    """The driver-side probe planner: the union of every query's
    `n_probe` nearest cells, computed from the broadcast-tiny
    centroid table WITHOUT touching the cluster — `term_bucket_py`'s
    geometric twin. Bit-faithful to `ivf_search`'s probe ranking:
    the same sequential-fold squared distance (left-to-right IEEE
    adds over double-widened components — `similarity.sq_norm`'s
    aggregate order) and the same (distance asc, cell asc) tie rule,
    so the pruned partitions are exactly a superset of what the
    search probes. Inputs are query-sized planner metadata (a query
    batch and ≤ n_cells centroids), never corpus data."""
    cells: set[int] = set()
    for q in query_vecs:
        qd = [float(x) for x in q]
        ranked = []
        for cell, cv in centroids:
            acc = 0.0
            for x, y in zip(qd, cv):
                d = x - y
                acc += d * d
            ranked.append((acc, int(cell)))
        ranked.sort()
        cells.update(c for _dist, c in ranked[:n_probe])
    return sorted(cells)


def read_ivf_serving(
    spark: SparkSession, out_dir: str, cells: list[int]
) -> tuple[DataFrame, DataFrame]:
    """(pruned assigned relation, centroid table) from an exported
    IVF serving layout: the cell IN-list lands as a partition filter
    the scan prunes on at plan time. Feed both to
    `similarity.ivf_search` — the probe join then finds every
    candidate it would have found in the full inverted file, because
    `cells` came from the same centroid ranking the search replays
    (`ivf_probe_cells_py`). The layout is merge-on-read: the pruned
    rows anti-apply the delta-sized tombstone side relation with the
    store's liveness rule (`_tg < _gen` keeps re-inserts above their
    tombstone), so a refreshed layout serves takedowns without ever
    having rewritten their cells."""
    meta = _read_ivf_serving_meta(out_dir)
    tombs = spark.read.schema(TOMB_SCHEMA).parquet(
        os.path.join(out_dir, meta["tombs"])
    )
    assigned = (
        _read_ivf_export(spark, out_dir)
        .filter(F.col("cell").isin(list(cells)))
        .join(F.broadcast(tombs), "neighbor_id", "left")
        .filter(F.col("_tg").isNull() | (F.col("_tg") < F.col("_gen")))
        .drop("_tg", "_gen")
    )
    # provably ≤ n_cells rows BEFORE the search's broadcast crossJoin
    # (`bm25_from_store`'s 1-row-stats adjudication): a corrupted
    # export with duplicate cell rows can never fan the rank join out
    centroids = (
        spark.read.schema(CENTROID_SCHEMA)
        .parquet(
            os.path.join(out_dir, meta.get("centroids", "centroids"))
        )
        .groupBy("cell")
        .agg(F.min("centroid").alias("centroid"))
    )
    return assigned, centroids


def read_ivf_serving_centroids(
    spark: SparkSession, out_dir: str
) -> DataFrame:
    """The exported layout's (tiny) centroid table — the driver-side
    probe planner's input — resolved through the meta so planners
    and the pruned read pair with one committed export version
    (version-tagged staging, r15 ADVICE); legacy fallback as in
    `_read_ivf_export`."""
    rel = _read_ivf_serving_meta(out_dir).get("centroids", "centroids")
    return spark.read.schema(CENTROID_SCHEMA).parquet(
        os.path.join(out_dir, rel)
    )


def _read_ivf_export(spark: SparkSession, out_dir: str) -> DataFrame:
    """The exported inverted file with its schema stated explicitly
    (partition column included) — an export whose every cell emptied
    leaves no part files, and schema inference would fail on the bare
    directory where an empty frame is the correct answer
    (`index._read_serving_parquet`'s rule). The physical directory
    resolves through the meta (version-tagged staging, r15 ADVICE),
    falling back to the legacy bare name for older layouts."""
    rel = _read_ivf_serving_meta(out_dir).get("assigned", "assigned")
    return spark.read.schema(
        "neighbor_id bigint, c_vec array<double>, c_norm double, "
        "_gen int, cell bigint"
    ).parquet(os.path.join(out_dir, rel))


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
    serving_out: str | None = None,
) -> DataFrame:
    """Drain the vector file stream under `availableNow`, maintaining
    the seeded inverted file one micro-batch at a time, and return
    the FINAL maintained `assigned` relation (feed it to
    `ivf_search`). Call again after new files land (same checkpoint):
    only the new files process — the q270/q273/q283 restart pattern.

    With `serving_out` (a layout previously created by
    `export_ivf_serving_layout` against this store), the stream is
    CONTINUOUS SERVING — `index_stream(serving_out=...)`'s geometric
    twin: each micro-batch ends with an incremental
    `refresh_ivf_serving_layout` (the batch's inserts rewrite only
    their cells, takedowns merge into the delta-sized delete files),
    so the cell-partitioned layout follows the stream with no
    scheduled job. Replay-safe for free (the refresh only moves
    forward and its partition rewrite is exact-(id, gen)
    idempotent); a crash between the generation commit and the
    refresh costs one version of staleness, repaired by the next
    batch.

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
            # the takedown set stays LAZY here (measured r18): unlike
            # the index/components streams it had no checkpoint or
            # isEmpty job to replace, so a bounded driver collect only
            # ADDED a per-batch job (+~1 s on the q284 lane) — its two
            # consumers (the tombs delta write, the refresh's tombs
            # fold) are one batch-scan each either way
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
        # one generation per batch, overwrite = replay-idempotent;
        # commit evidence (sentinel AND the marker's _SUCCESS)
        # cleared first, stamped after the marker ("tombs")
        uncommit_delta(store_dir, g, marker="tombs")
        assigned_delta.write.mode("overwrite").parquet(
            _delta_path(store_dir, g, "assigned")
        )
        deleted.write.mode("overwrite").parquet(
            _delta_path(store_dir, g, "tombs")
        )
        commit_delta(store_dir, g)
        if compact_every and g % compact_every == 0:
            _compact_ivf(s, store_dir, g)
        if serving_out is not None:
            refresh_ivf_serving_layout(s, store_dir, serving_out)

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
