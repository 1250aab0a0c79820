"""Global row numbering without a single-reducer sort.

`row_number() OVER (ORDER BY ...)` funnels every row through one
task — fine for 10-row reports (q54), fatal at 100 TB. The scalable
spelling: range-partition by the ordering key (sampled split points,
Spark's native `repartitionByRange`), number rows within each
partition, then add the exclusive prefix-sum of partition sizes —
the sizes (one long per partition) are the ONLY data that touches
the driver. The reference's implicit pandas row index
(`functions_v2.py` passim) is this operator's motivation: every
"idx"-keyed structure needs an explicit deterministic key in a
distributed engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_row_ids(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign 0-based dense global row ids in `order_cols` order
    (which must be a total order — add a tiebreaker column if not).

    Three steps, no global sort: (1) repartitionByRange on the keys
    — partition i holds keys strictly below partition i+1's; (2)
    sortWithinPartitions + per-partition row_number (each task
    numbers only its own rows); (3) join the broadcast exclusive
    prefix-sum of partition counts. Cost: the range shuffle + a
    count job; the window never crosses partitions.
    """
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    ranged = ranged.sortWithinPartitions(*cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = ranged.withColumn("_local", F.row_number().over(w))
    sizes = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = sizes.select(
        "_pid",
        (
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("_offset"),
    ).fillna(0, subset=["_offset"])
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_local") - 1).cast("bigint"))
        .drop("_pid", "_local", "_offset")
    )


def shard_assignment(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", out_col: str = "shard"
) -> Column | DataFrame:
    """Deterministic shard id in [0, n_shards) from an engine-portable
    md5 hash of the row key — the write-side of "emit the corpus as N
    stable shards". Unlike `pmod(hash(id))`, the assignment is
    reproducible in any engine, so a manifest built today still
    describes shards written last year."""
    from patientdataintegration_spark.functions.deterministic import md5_bigint

    shard = (
        md5_bigint(F.col(id_col).cast("string")) % F.lit(n_shards)
    ).cast("int")
    return df.withColumn(out_col, shard)


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bytes_col: str = "n_chars",
) -> DataFrame:
    """Per-shard manifest of a corpus emit: document count, exact
    token and byte totals, and the id range — what a training loader
    checks before streaming a shard, and what an auditor diffs after
    a re-emit. One hash-agg shuffle keyed on the shard id; with
    n_shards partitions the agg IS the shard layout, so writing the
    data `partitionBy(shard)` reuses the same key."""
    from patientdataintegration_spark.operators.textops import token_count

    with_shard = shard_assignment(
        df.select(id_col, text_col, bytes_col), n_shards, id_col=id_col
    )
    return with_shard.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count(F.col(text_col)).cast("bigint"))
        .cast("bigint")
        .alias("total_tokens"),
        F.sum(F.col(bytes_col).cast("bigint")).cast("bigint").alias("total_bytes"),
        F.min(F.col(id_col)).cast("bigint").alias("min_id"),
        F.max(F.col(id_col)).cast("bigint").alias("max_id"),
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_postings: int | None = None,
) -> DataFrame:
    """Term → (doc-frequency, sorted posting list) over the corpus —
    the retrieval/audit index a data pipeline builds next to the
    shards (which documents contain this contaminated string?).

    Scale shape: per-doc DISTINCT terms explode (O(tokens) rows),
    then ONE shuffle on the term key serving both the doc-frequency
    window-count and the posting cap — `row_number` per term keeps
    at most `max_postings` doc ids BEFORE `collect_list`, so a
    stop-word's posting list never materializes O(corpus) elements
    in one task. The final groupBy reuses the window's hash
    partitioning (no second exchange under AQE)."""
    from patientdataintegration_spark.operators.textops import tokens

    t = df.select(
        F.col(id_col).cast("bigint").alias("_doc"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    ranked = _rank_term_docs(t)
    if max_postings is not None:
        ranked = ranked.filter(F.col("_rn") <= max_postings)
    return _roll_postings(ranked, min_df)


def _freeze_terms(terms: DataFrame) -> DataFrame:
    """Freeze a delta-sized distinct dirty-term relation for its
    multiple consumers (the caller's anti-probes + the repair semis):
    bounded driver collect into a LOCAL relation when it fits
    `spark.pdi.stream.driverMaxKeyRows` (guide §1.2 / r17 verdict
    item 2 — same one job as the localCheckpoint it replaces, but
    every broadcast probe becomes a LocalTableScan build and the
    term list itself rides along as `_pdi_local_rows` for the
    streaming caller's driver-side planning: net-dirty unions, the
    commit-marker write, serving-bucket computation). Above the cap:
    the relation comes back lazily pinned — already materialized by
    the probe, one job either way — so a build-scale batch whose
    vocabulary outgrows the cap keeps the r17 checkpoint shape
    automatically."""
    from patientdataintegration_spark.streaming.components import freeze_small

    df, vals = freeze_small(terms, "term string")
    if vals is not None:
        df._pdi_local_rows = vals
    return df


def _rank_term_docs(term_docs: DataFrame) -> DataFrame:
    """One shuffle on the term key serving both the doc-frequency
    window-count and the posting cap — shared by the index builders
    and `retract_inverted_index`'s dirty-term repair."""
    w = Window.partitionBy("term")
    return term_docs.select(
        "term",
        "_doc",
        F.count(F.lit(1)).over(w).alias("_df"),
        F.row_number().over(w.orderBy(F.col("_doc").asc())).alias("_rn"),
    )


def _roll_postings(ranked: DataFrame, min_df: int) -> DataFrame:
    return (
        ranked.groupBy("term")
        .agg(
            F.max("_df").cast("bigint").alias("doc_freq"),
            F.sort_array(F.collect_list("_doc")).alias("postings"),
        )
        .filter(F.col("doc_freq") >= min_df)
    )


def _split_ranked(
    ranked: DataFrame, min_df: int, max_postings: int | None
) -> tuple[DataFrame, DataFrame]:
    """Split a `_rank_term_docs` relation into the (index, overflow)
    pair: rows at or under the cap roll into postings arrays, rows
    past it stay relational — the shared tail of the builder
    (`inverted_index_with_overflow`) and both maintenance verbs
    (`retract_inverted_index`, `extend_inverted_index`), so all
    three are bit-identical by construction."""
    capped = (
        ranked if max_postings is None
        else ranked.filter(F.col("_rn") <= max_postings)
    )
    index = _roll_postings(capped, min_df)
    if max_postings is None:
        overflow = ranked.select(
            "term", F.col("_doc").alias("doc")
        ).filter(F.lit(False))
    else:
        overflow = ranked.filter(F.col("_rn") > max_postings).select(
            "term", F.col("_doc").alias("doc")
        )
    return index, overflow


def inverted_index_with_overflow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_postings: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """`inverted_index` plus its OVERFLOW relation — the (term, doc)
    rows the posting cap displaced, kept RELATIONAL (never collected
    into arrays, so a stop-word's overflow stays a partitioned
    table, exactly the O(corpus)-elements-in-one-task hazard the cap
    exists to avoid). The overflow is what makes the capped index
    MAINTAINABLE under deletes: removing a doc from an AT-CAP
    postings list must re-admit the smallest displaced posting, which
    the index alone cannot know (`retract_inverted_index`). doc_freq
    already counts postings ∪ overflow, so the pair (index, overflow)
    is a lossless factorization of the uncapped index for every
    STORED term; terms below `min_df` are dropped from both, which
    stays sound under deletes (a delete only lowers doc-frequency,
    so a dropped term can never need to re-enter).

    At 100 TB the overflow concentrates on the few hottest terms and
    lives beside the index, partition-pruned by term hash; pipelines
    that accept lossy-under-deletes caps simply don't store it (and
    then `retract_inverted_index` must not be used — state the
    contract either way, per the q268/q272 coverage-contract
    discipline)."""
    from patientdataintegration_spark.operators.textops import tokens

    t = df.select(
        F.col(id_col).cast("bigint").alias("_doc"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    # one window shuffle feeds BOTH outputs: freeze it (delta-free
    # builders run once at build time; the localCheckpoint spares the
    # corpus re-scan for the overflow side)
    ranked = _rank_term_docs(t).localCheckpoint()
    return _split_ranked(ranked, min_df, max_postings)


def retract_inverted_index(
    index: DataFrame,
    overflow: DataFrame,
    deleted_ids: DataFrame,
    min_df: int = 1,
    max_postings: int | None = None,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Inverted-index maintenance under DOCUMENT DELETES — the
    erasure verb for the retrieval store (q110 builds it; a pipeline
    that honors takedowns but leaves the doc discoverable through
    term lookup has not erased it). Returns the maintained
    (index', overflow') pair.

    The repair contract (the interesting part, stated explicitly per
    the q268/q272 discipline): deleting a doc from an AT-CAP postings
    list RE-ADMITS the smallest displaced posting from the overflow
    relation — the capped index alone is lossy under deletes, the
    (index, overflow) factorization is not. Dirty-term repair, the
    q256/q272 pattern:

    1. dirty terms = terms whose postings array or overflow rows
       mention a deleted doc: the postings side streams the index
       ONCE (explode + broadcast semi — no shuffle; at 100 TB this
       is the same one-scan cost as any audit of the index), the
       overflow side is a broadcast semi on its rows;
    2. untouched terms pass through verbatim behind one broadcast
       anti-probe — the vocabulary-sized bulk, never re-aggregated;
    3. dirty terms rebuild from THEIR complete (term, doc) rows
       (postings ∪ overflow restricted to dirty terms, minus the
       deleted docs): re-rank, re-cap, re-roll — a delta-sized
       shuffle that re-elects displaced postings, decrements
       doc_freq, and drops terms that fall below min_df.

    Bit-identical to `inverted_index_with_overflow` over the
    surviving corpus (both outputs) — pinned by the at-cap
    adversarial test in tests/test_etl_operators.py and hash-proven
    by q277's full-rebuild oracle."""
    dirty_terms, repaired_index, repaired_overflow = retract_inverted_index_delta(
        index, overflow, deleted_ids, min_df, max_postings, id_col
    )
    clean_index = index.join(F.broadcast(dirty_terms), "term", "left_anti")
    clean_overflow = overflow.join(F.broadcast(dirty_terms), "term", "left_anti")
    return (
        clean_index.unionByName(repaired_index).select(*index.columns),
        clean_overflow.unionByName(repaired_overflow).select(*overflow.columns),
    )


def retract_inverted_index_delta(
    index: DataFrame,
    overflow: DataFrame,
    deleted_ids: DataFrame,
    min_df: int = 1,
    max_postings: int | None = None,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """`retract_inverted_index` restated as a WRITE-SIDE DELTA —
    returns (dirty_terms, index_rows, overflow_rows): the terms the
    takedown touches (every one whose postings or overflow mention a
    deleted doc) and their complete REPAIRED rows; a dirty term
    absent from both repaired relations fell below min_df and leaves
    the index. `retract_inverted_index` composes the full relations
    on top (clean bulk behind one broadcast anti ∪ these rows); a
    persisted store appends them as one term-grain upsert generation
    (`streaming/index.py`) instead of rewriting the vocabulary —
    the same decomposition `maintain_components_delta` /
    `retract_documents_delta` gave the dedup stores
    (operators/dedup.py)."""
    dele = F.broadcast(
        deleted_ids.select(F.col(id_col).cast("bigint").alias("_doc")).distinct()
    )
    posted = index.select(
        "term", F.explode("postings").alias("_doc")
    )
    dirty_terms = _freeze_terms(
        posted.join(dele, "_doc", "left_semi")
        .select("term")
        .unionByName(
            overflow.join(
                dele.withColumnRenamed("_doc", "doc"), "doc", "left_semi"
            ).select("term")
        )
        .distinct()
    )
    members = (
        posted.join(F.broadcast(dirty_terms), "term", "left_semi")
        .unionByName(
            overflow.join(F.broadcast(dirty_terms), "term", "left_semi")
            .select("term", F.col("doc").alias("_doc"))
        )
        .join(dele, "_doc", "left_anti")
    )
    ranked = _rank_term_docs(members).localCheckpoint()  # index + overflow sides
    repaired_index, repaired_overflow = _split_ranked(ranked, min_df, max_postings)
    return dirty_terms, repaired_index, repaired_overflow


def extend_inverted_index(
    index: DataFrame,
    overflow: DataFrame,
    new_docs: DataFrame,
    min_df: int = 1,
    max_postings: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Inverted-index maintenance under DOCUMENT INSERTS — the verb
    that completes the index family's CRUD: build (q110), read
    (q279/q280), delete (`retract_inverted_index`), and now create.
    Returns the maintained (index', overflow') pair, bit-identical
    to `inverted_index_with_overflow` over the old ∪ new corpus.

    The exactness contract (stated explicitly, per the q268/q272
    discipline): inserts require a **min_df=1 store**. A term below
    `min_df` at build time is dropped from BOTH relations, so when
    new documents push it over the threshold its old rows are
    unrecoverable — the factorization that is lossless under deletes
    (doc-frequency only falls, a dropped term can never re-enter) is
    lossy under inserts for any min_df > 1. The maintained store
    therefore keeps every term and readers apply min_df as a
    serve-time filter on doc_freq (`WHERE doc_freq >= k` — exactly
    equivalent to a min_df=k build, since the cap ranks within a
    term independently of the term filter). Passing min_df > 1
    raises rather than silently undercounting.

    Re-ingesting a document with IDENTICAL content is idempotent:
    every (term, doc) row of the re-ingested doc lands in the dirty
    sliver (all its terms are in the batch's term set), where the
    (term, doc) dedup collapses stored and incoming copies. Content
    MUTATION under an existing id is out of contract — retract then
    extend, the q272/q275 CRUD discipline.

    Scale shape (the mirror of `retract_inverted_index`): dirty
    terms = the batch's distinct terms — delta-sized, broadcast;
    untouched terms (the vocabulary bulk) pass through verbatim
    behind one broadcast anti-probe; dirty terms rebuild from their
    complete (term, doc) rows — stored postings ∪ overflow restricted
    to dirty terms, plus the batch's rows — re-ranked, re-capped,
    re-rolled in one delta-sized shuffle that demotes displaced
    postings into the overflow and admits brand-new terms. The index
    and overflow each stream once; nothing corpus-sized shuffles."""
    dirty_terms, repaired_index, repaired_overflow = extend_inverted_index_delta(
        index, overflow, new_docs, min_df, max_postings, text_col, id_col
    )
    clean_index = index.join(F.broadcast(dirty_terms), "term", "left_anti")
    clean_overflow = overflow.join(F.broadcast(dirty_terms), "term", "left_anti")
    return (
        clean_index.unionByName(repaired_index).select(*index.columns),
        clean_overflow.unionByName(repaired_overflow).select(*overflow.columns),
    )


def extend_inverted_index_delta(
    index: DataFrame,
    overflow: DataFrame,
    new_docs: DataFrame,
    min_df: int = 1,
    max_postings: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """`extend_inverted_index` restated as a WRITE-SIDE DELTA —
    returns (dirty_terms, index_rows, overflow_rows): the ingest
    batch's distinct terms and their complete post-insert rows.
    Same contract as the full verb (min_df=1 store required — see
    `extend_inverted_index`), same decomposition as
    `retract_inverted_index_delta`: the full verb composes the clean
    bulk behind one broadcast anti; a persisted store appends these
    as one term-grain upsert generation (`streaming/index.py`)."""
    from patientdataintegration_spark.operators.textops import tokens

    if min_df != 1:
        raise ValueError(
            "extend_inverted_index requires a min_df=1 store: terms below "
            "min_df are dropped from both relations at build time, so their "
            "rows are unrecoverable when inserts push them over the "
            f"threshold (got min_df={min_df}). Keep every term in the "
            "maintained store and apply min_df at serve time as a filter "
            "on doc_freq."
        )
    t_new = new_docs.select(
        F.col(id_col).cast("bigint").alias("_doc"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    dirty_terms = _freeze_terms(t_new.select("term").distinct())
    stored = (
        index.select("term", F.explode("postings").alias("_doc"))
        .join(F.broadcast(dirty_terms), "term", "left_semi")
        .unionByName(
            overflow.join(F.broadcast(dirty_terms), "term", "left_semi")
            .select("term", F.col("doc").alias("_doc"))
        )
    )
    # (term, doc) dedup makes identical-content re-ingest idempotent;
    # for a disjoint batch it is a no-op on a delta-sized relation
    members = stored.unionByName(t_new).dropDuplicates(["term", "_doc"])
    ranked = _rank_term_docs(members).localCheckpoint()  # index + overflow sides
    repaired_index, repaired_overflow = _split_ranked(ranked, min_df, max_postings)
    return dirty_terms, repaired_index, repaired_overflow


def crud_inverted_index_delta(
    index: DataFrame,
    overflow: DataFrame,
    new_docs: DataFrame,
    deleted_ids: DataFrame,
    max_postings: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """ONE-PASS net repair for a micro-batch carrying BOTH inserts and
    takedowns (inserts first, takedowns second — the q275 order):
    returns (dirty_terms, index_rows, overflow_rows) BIT-IDENTICAL to
    `extend_inverted_index_delta` followed by
    `retract_inverted_index_delta` over the lazily-composed
    post-insert state, in ONE dirty-term derivation and ONE re-rank
    instead of two of each (r17 verdict item 2 — the two
    `_rank_term_docs` checkpoints were the stream's priciest per-batch
    jobs). min_df is fixed at 1, the maintained store's contract
    (`extend_inverted_index`).

    Equality argument: (a) the net dirty set — retract's dirty terms
    are those whose POST-INSERT rows mention a deleted doc; a batch
    term's post-insert rows are stored ∪ batch ⊇ stored, and every
    batch term is already insert-dirty, so the union reduces to
    D = batch vocabulary ∪ {terms whose STORED postings/overflow
    mention a deleted doc} — computable against the OLD state, no
    post-insert composition. (b) the net rows per dirty term t:
    extend-then-retract yields ((stored(t) ∪ batch(t)) dedup)
    ∖ deleted docs, re-ranked and re-capped — for t with no deleted
    reference the ∖ is a no-op (extend's result), for a delete-only t
    the batch contributes no rows (retract's repair) — which is
    exactly the single expression below. A doc ingested and taken
    down in the SAME batch enters members and is then removed: the
    definitional insert-before-takedown order. Pinned by the
    fused-vs-composed equivalence test in
    tests/test_streaming_index.py and q283/q275's full-rebuild
    oracles."""
    from patientdataintegration_spark.operators.textops import tokens

    t_new = new_docs.select(
        F.col(id_col).cast("bigint").alias("_doc"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    dele = F.broadcast(
        deleted_ids.select(
            F.col(id_col).cast("bigint").alias("_doc")
        ).distinct()
    )
    posted = index.select("term", F.explode("postings").alias("_doc"))
    del_dirty = (
        posted.join(dele, "_doc", "left_semi")
        .select("term")
        .unionByName(
            overflow.join(
                dele.withColumnRenamed("_doc", "doc"), "doc", "left_semi"
            ).select("term")
        )
    )
    dirty_terms = _freeze_terms(
        t_new.select("term").unionByName(del_dirty).distinct()
    )
    stored = (
        posted.join(F.broadcast(dirty_terms), "term", "left_semi")
        .unionByName(
            overflow.join(F.broadcast(dirty_terms), "term", "left_semi")
            .select("term", F.col("doc").alias("_doc"))
        )
    )
    members = (
        stored.unionByName(t_new)
        .dropDuplicates(["term", "_doc"])
        .join(dele, "_doc", "left_anti")
    )
    ranked = _rank_term_docs(members).localCheckpoint()  # index + overflow
    repaired_index, repaired_overflow = _split_ranked(ranked, 1, max_postings)
    return dirty_terms, repaired_index, repaired_overflow


def positional_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The POSITIONAL postings relation: one (term, doc, pos) row per
    token occurrence, positions 1-based, duplicates kept — the
    artifact phrase and proximity queries need, which the
    document-grain index (q110) cannot answer (it stores WHERE a term
    appears, not where within the document; Lucene's analogue is the
    .prx/.pos file beside the .doc postings).

    Position is assigned BEFORE the empty-token filter, so offsets
    are stable against how the tokenizer treats runs of separators —
    the same convention an engine mirroring this relation from raw
    text must follow. One scan, one narrow explode; the relation is
    O(total tokens) and term-partitionable like any postings store."""
    from patientdataintegration_spark.operators.textops import tokens

    return (
        df.select(
            F.col(id_col).cast("bigint").alias("doc"),
            F.posexplode(tokens(F.col(text_col))).alias("_p0", "term"),
        )
        .withColumn("pos", (F.col("_p0") + 1).cast("bigint"))
        .filter(F.col("term") != "")
        .select("term", "doc", "pos")
    )


def phrase_retrieval(
    positions: DataFrame,
    term_pairs: DataFrame,
    term_a: str = "term_a",
    term_b: str = "term_b",
) -> DataFrame:
    """Exact two-term PHRASE retrieval over the positional postings:
    for each (term_a, term_b) query, every occurrence where term_b
    immediately follows term_a in the same document — the adjacency
    join conjunctive retrieval (q279) cannot express (AND proves
    co-occurrence anywhere in the doc; a phrase needs pos_b =
    pos_a + 1). Overlapping matches count individually ("a a a"
    contains "a a" twice), which is why the answer is a positional
    JOIN and not a substring count.

    Scale shape: the queried terms broadcast as two semi-probes, so
    the corpus-sized positional relation streams once per side
    reduced to the queried terms' rows; the adjacency join keys on
    (doc, pos) within a queried pair — shuffle volume is the queried
    postings only. Returns (term_a, term_b, doc, pos) match rows
    (pos = the phrase start); callers aggregate to hit counts."""
    pairs = term_pairs.select(
        F.col(term_a).alias("_ta"), F.col(term_b).alias("_tb")
    ).distinct()
    side_a = positions.join(
        F.broadcast(pairs.select(F.col("_ta").alias("term")).distinct()),
        "term",
        "left_semi",
    ).select(F.col("term").alias("_ta"), "doc", "pos")
    side_b = positions.join(
        F.broadcast(pairs.select(F.col("_tb").alias("term")).distinct()),
        "term",
        "left_semi",
    ).select(
        F.col("term").alias("_tb"),
        "doc",
        (F.col("pos") - 1).alias("pos"),  # align to the phrase start
    )
    return (
        F.broadcast(pairs)
        .join(side_a, "_ta")
        .join(side_b, ["_tb", "doc", "pos"])
        .select(
            F.col("_ta").alias(term_a),
            F.col("_tb").alias(term_b),
            "doc",
            "pos",
        )
    )


def phrase_retrieval_nterm(
    positions: DataFrame,
    phrases: DataFrame,
    phrase_id_col: str = "phrase_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Exact N-TERM phrase retrieval over the positional postings —
    `phrase_retrieval` generalized past (a, b) adjacency (r13 verdict
    item 2): for each phrase (an array of terms), every occurrence
    where the terms appear CONSECUTIVELY in a document. Returns
    (phrase_id, doc, pos) rows, pos = the phrase start; overlapping
    matches count individually ("a a a a" contains "a a a" twice).

    The join is NOT a chained per-offset self-join (n−1 joins for an
    n-term phrase): each queried (phrase, offset i, term) row aligns
    candidate token occurrences to their implied phrase START
    (start = pos − i), and a start is a match iff ALL n offsets
    aligned to it — one join + one (phrase, doc, start) aggregate,
    independent of phrase length and of mixed-length phrase batches.
    Correct under repeated terms ("a a a"): offset i matches at start
    iff the token AT start+i is term_i, and positions are unique per
    (doc, pos) — `positional_postings` emits exactly one term per
    position — so distinct matched offsets == n proves every slot.

    Scale shape: the phrases explode to (phrase, i, term) — query-
    sized, broadcast; the corpus-sized positional relation streams
    ONCE behind a semi-probe on the queried terms; the alignment join
    fans each queried-term occurrence out only to the phrases that
    contain it, and the aggregate keys on (phrase, doc, start) —
    shuffle volume is the queried postings only."""
    pterms = (
        phrases.select(
            F.col(phrase_id_col).alias("_pid"),
            F.posexplode(F.col(terms_col)).alias("_i", "term"),
        )
        .distinct()
        .localCheckpoint()  # consumers: the semi-probe + the alignment join
    )
    plen = pterms.groupBy("_pid").agg(
        (F.max("_i") + 1).alias("_n")
    )
    hits = positions.join(
        F.broadcast(pterms.select("term").distinct()), "term", "left_semi"
    )
    aligned = (
        hits.join(F.broadcast(pterms), "term")
        .select("_pid", "_i", "doc", (F.col("pos") - F.col("_i")).alias("_start"))
        .filter(F.col("_start") >= 1)
    )
    return (
        aligned.groupBy("_pid", "doc", "_start")
        .agg(F.countDistinct("_i").alias("_hit"))
        .join(F.broadcast(plen), "_pid")
        .filter(F.col("_hit") == F.col("_n"))
        .select(
            F.col("_pid").alias(phrase_id_col),
            "doc",
            F.col("_start").cast("bigint").alias("pos"),
        )
    )


def full_postings(index: DataFrame, overflow: DataFrame) -> DataFrame:
    """The complete (term, doc) relation of a capped index: visible
    postings exploded ∪ the overflow rows. This is the READ-side
    payoff of the (index, overflow) factorization: a consumer that
    needs exact answers (conjunctive retrieval, erasure repair)
    composes it; a consumer happy with the cap (preview UIs) reads
    the arrays alone. One streamed scan of each relation, no
    shuffle."""
    return index.select(
        "term", F.explode("postings").alias("doc")
    ).unionByName(overflow.select("term", "doc"))


def conjunctive_retrieval(
    index: DataFrame,
    overflow: DataFrame,
    term_pairs: DataFrame,
    term_a: str = "term_a",
    term_b: str = "term_b",
) -> DataFrame:
    """Boolean-AND retrieval over the capped inverted index: for each
    (term_a, term_b) query, the docs containing BOTH terms — answered
    EXACTLY by intersecting `full_postings` sides, which is the point
    of storing the overflow: the capped arrays alone silently drop
    every hit past position `max_postings` (a hot term's intersection
    would be bounded by the cap instead of the corpus).

    Scale shape: the query terms broadcast as two semi-probes, so
    each side of the intersection is one streamed scan of
    index+overflow reduced to the queried terms' rows; the join key
    is (doc) within a queried pair — shuffle volume is the queried
    postings only, never the index. Returns (term_a, term_b, doc)
    rows; callers aggregate to hit counts/ids."""
    pairs = term_pairs.select(
        F.col(term_a).alias("_ta"), F.col(term_b).alias("_tb")
    ).distinct()
    post = full_postings(index, overflow)
    side_a = post.join(
        F.broadcast(pairs.select(F.col("_ta").alias("term")).distinct()),
        "term",
        "left_semi",
    ).select(F.col("term").alias("_ta"), "doc")
    side_b = post.join(
        F.broadcast(pairs.select(F.col("_tb").alias("term")).distinct()),
        "term",
        "left_semi",
    ).select(F.col("term").alias("_tb"), "doc")
    return (
        F.broadcast(pairs)
        .join(side_a, "_ta")
        .join(side_b, ["_tb", "doc"])
        .select(
            F.col("_ta").alias(term_a),
            F.col("_tb").alias(term_b),
            "doc",
        )
    )


def doc_term_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The BM25 SCORING-STATISTICS relation: one (term, doc, tf,
    len_d) row per distinct (document, term) — term frequency plus
    the document length DENORMALIZED onto every row. This is the
    third relation of the maintained index store
    (`streaming/index.py`): postings answer WHICH docs contain a
    term, these rows carry what ranking needs (Lucene's .doc tf
    stream + norms file, relationally).

    len_d denormalizes soundly because a document's length is fixed
    at ingest — content MUTATION under an existing id is out of the
    store's contract (retract then extend, the q272/q275 CRUD
    discipline) — so the relation stays TERM-GRAIN maintainable: a
    dirty term's rows are wholly replaced without consulting any
    other term. One explode + one (doc, term) hash agg; the len_d
    window repartitions by doc once — build-time cost, same order as
    the index build itself."""
    from patientdataintegration_spark.operators.textops import tokens

    toks = df.select(
        F.col(id_col).cast("bigint").alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    w = Window.partitionBy("doc")
    return tf.withColumn("len_d", F.sum("tf").over(w).cast("bigint")).select(
        "term", "doc", "tf", "len_d"
    )


def corpus_stats(tf: DataFrame) -> DataFrame:
    """The 1-row (n_docs, total_tokens) marginal of a `doc_term_stats`
    relation — the store's `stats` sub-relation at seed time. Exact
    integers: BM25's avgdl enters every impact as
    len_d·n_docs/total_tokens (one double division), so maintaining
    these two counters exactly keeps served scores bit-identical to a
    corpus recompute."""
    return (
        tf.select("doc", "len_d")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("len_d").cast("bigint").alias("total_tokens"),
        )
    )


def _bm25_impact(k1: float, b: float) -> Column:
    """The per-(term, doc) Okapi BM25 impact EXPRESSION over columns
    (tf, df, len_d, n_docs, total_tokens) — factored out so the
    corpus-recompute path (`bm25_topk`) and the store-serving path
    (`bm25_from_store`) score with the IDENTICAL tree (literals,
    association, parenthesization): served-from-store equality with
    recompute is then by construction, with libm's ln the only FP
    surface (absorbed by the caller's round-then-DECIMAL-sum)."""
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfnorm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b)
            * F.col("len_d")
            * F.col("n_docs")
            / F.col("total_tokens")
        )
    )
    return idf * tfnorm


def _bm25_rank(
    impacts: DataFrame,
    q_terms: DataFrame,
    k: int,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """Shared tail of both BM25 paths: fan the (query, term) relation
    out over the precomputed per-(term, doc) decimal impacts, sum
    exactly, window top-k per query (self-hits excluded)."""
    scored = (
        impacts.join(F.broadcast(q_terms), "term")
        .filter(F.col("_q") != F.col("_doc"))
        .groupBy("_q", "_doc")
        .agg(F.sum("_impact").alias("_s"))
    )
    w = Window.partitionBy("_q").orderBy(
        F.col("_s").desc(), F.col("_doc").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("_q").alias(query_id_col),
            F.col("_doc").alias(id_col),
            F.col("_s").cast("double").alias("score"),
            "rnk",
        )
    )


def bm25_from_store(
    tf_store: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    round_digits: int = 6,
) -> DataFrame:
    """BM25 top-k retrieval SERVED FROM THE MAINTAINED STORE — the
    r13 verdict's lead item: `bm25_topk` re-derives (doc, term, tf),
    df, doc lengths and corpus totals from the RAW corpus on every
    call, which at 100 TB forfeits the entire point of maintaining an
    index (q281/q277/q283). This path tokenizes ONLY the query text;
    every corpus-derived number comes from two store relations —
    `tf_store` (term, doc, tf, len_d — `doc_term_stats` rows, the
    store's scoring sub-relation) and `stats` (the 1-row
    n_docs/total_tokens marginal) — so serving never scans, shuffles
    or re-tokenizes documents (pinned by the inputFiles plan test in
    tests/test_scoring_store.py).

    df is NOT stored: for the queried terms it equals the per-term
    row count of their own store rows, which serving reads anyway —
    recomputing it there is delta-sized and keeps the store free of
    a relation that every insert/delete of a term's rows would have
    to touch. avgdl is likewise folded into query time from the
    exact (n_docs, total_tokens) counters, the Lucene treatment the
    r13 verdict asked for — no impact staleness contract needed,
    because no impact is persisted.

    Exactness: scores == `bm25_topk` over the same corpus state,
    BIT-IDENTICAL — both paths round the shared `_bm25_impact` tree
    to `round_digits` then sum as DECIMAL(28,12) (the q82
    discipline), and every impact input (tf, df, len_d, n_docs,
    total_tokens) is an exact integer maintained exactly by the
    store verbs. q285's oracle is the corpus recompute; q289
    certifies the equality inside one DAG.

    Scale shape: the queried terms broadcast as one semi-probe, so
    the corpus-sized tf store streams ONCE reduced to Σ df(query
    terms) candidate rows (the `max_df` WAND-style guard bounds that
    at |terms|·max_df); df is a candidate-sized agg; the 1-row stats
    broadcast; the top-k is one per-query window."""
    from patientdataintegration_spark.operators.textops import tokens

    q_terms = (
        queries.select(
            F.col(query_id_col).cast("bigint").alias("_q"),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    cand = tf_store.join(
        F.broadcast(q_terms.select("term").distinct()), "term", "left_semi"
    ).localCheckpoint()  # consumers: the df agg + the impact join
    # df = the per-term candidate row count DIRECTLY: tf_store rows
    # are (term, doc)-unique by the relation's contract (they are
    # `doc_term_stats` rows — one row per distinct (document, term),
    # maintained wholesale per term by the store verbs), so the
    # previous defensive `.distinct()` only re-shuffled the full
    # candidate (term, doc) set before counting; the plain count
    # map-side-combines to |terms| rows (guide §2.3)
    dfreq = cand.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    guarded = cand
    if max_df is not None:
        rare = dfreq.filter(F.col("df") <= max_df)
        guarded = cand.join(
            F.broadcast(rare.select("term")), "term", "left_semi"
        )
    # reduce the stats relation to a PROVABLY single-row frame (max
    # over its one row is the identity): the broadcast-scalar cross
    # join stays the sanctioned aggregate-derived shape even though
    # the store relation arrives as a parquet scan, and a corrupted
    # multi-row stats store can never silently fan the join out
    totals = stats.agg(
        F.max("n_docs").alias("n_docs"),
        F.max("total_tokens").alias("total_tokens"),
    )
    impacts = (
        guarded.withColumnRenamed("doc", "_doc")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            "_doc",
            F.round(_bm25_impact(k1, b), round_digits)
            .cast("decimal(28,12)")
            .alias("_impact"),
        )
    )
    return _bm25_rank(impacts, q_terms, k, id_col, query_id_col)


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    round_digits: int = 6,
) -> DataFrame:
    """BM25 top-k retrieval: score every corpus document against each
    query's DISTINCT terms and keep the k best — the ranking function
    the inverted-index family serves in production (Lucene/ES
    default), here as one declarative DAG over the same (doc, term,
    tf) statistics q46's tf-idf uses.

        idf(t)       = ln((N - df + 0.5) / (df + 0.5) + 1)
        tfnorm(t, d) = tf*(k1+1) / (tf + k1*(1 - b + b*len_d/avgdl))
        score(q, d)  = Σ_t∈q round(idf*tfnorm, 6) as DECIMAL(28,12)

    Exactness contract (the q82 ln-sum discipline): each per-term
    score is rounded to 6 digits THEN summed as exact decimal, so the
    per-(query, doc) total — and therefore the ranking — is
    order-independent across partitionings and engines; idf*tfnorm is
    irrational (positive ln times a rational), so the round can never
    land on a decimal boundary. avgdl enters as len_d*N/total_tokens,
    keeping every input to the double expression an exact integer.

    `max_df` (optional) drops query terms hotter than the threshold
    (stop-word elimination — the standard WAND-style guard): it
    bounds the scored candidate set per query term at max_df docs,
    which is what makes the (query_term ⋈ tf) join delta-sized at
    100 TB instead of |queries| × |corpus| (a stop word would pair
    every query with every document for a near-zero idf
    contribution). The threshold changes the SEMANTICS (guarded
    terms contribute nothing), so it is part of the caller's stated
    contract; with None every term scores — the right setting when
    the vocabulary is small relative to the corpus (q280's synthetic
    corpus has 31 terms, all corpus-frequent: guarded, every query
    would be empty).

    Scale: ONE explode + hash agg builds the (doc, term, tf)
    statistics relation — frozen once (it feeds four consumers: df,
    doc lengths, totals, candidates; in production it IS the
    persisted scoring index next to q110's postings) — then df and
    doc_len are tf-sized aggs (len_d = Σ tf, no second explode);
    N/total broadcast as 1-row frames; the query-term relation
    broadcasts against tf; the final top-k is one per-query
    window."""
    from patientdataintegration_spark.operators.textops import tokens
    from patientdataintegration_spark.plans.partitioning import fan_out

    toks = fan_out(corpus.select(id_col, text_col)).select(
        F.col(id_col).cast("bigint").alias("_doc"),
        F.explode(tokens(F.lower(F.trim(F.col(text_col))))).alias("term"),
    ).filter(F.col("term") != "")
    tf = (
        toks.groupBy("_doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # len_d as a window over the pinned tf (the `doc_term_stats`
    # shape) instead of a separate doclen aggregate joined back on
    # _doc: the join repartitioned BOTH sides by _doc — two more
    # corpus-sized exchanges than the one the window needs (guide
    # §2.4); and the corpus totals come straight off tf (Σ tf = total
    # tokens; distinct-doc count partial-aggregates) without the
    # doclen detour. Same exact integers either way.
    w_doc = Window.partitionBy("_doc")
    tfl = tf.withColumn("len_d", F.sum("tf").over(w_doc))
    totals = tf.agg(
        F.count_distinct(F.col("_doc")).alias("n_docs"),
        F.sum("tf").alias("total_tokens"),
    )
    q_terms = (
        queries.select(
            F.col(query_id_col).cast("bigint").alias("_q"),
            F.explode(
                F.array_distinct(tokens(F.lower(F.trim(F.col(text_col)))))
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    guarded = tfl
    if max_df is not None:
        rare = dfreq.filter(F.col("df") <= max_df)
        guarded = tfl.join(F.broadcast(rare), "term", "left_semi")
    # per-(term, doc) IMPACT, computed ONCE on the tf-sized relation —
    # the score contribution is query-independent (Lucene's impact
    # trick), so the |queries| fan-out below only SUMS precomputed
    # decimals instead of re-evaluating ln per candidate row; the
    # expression tree is the shared `_bm25_impact`, so the
    # store-serving path (`bm25_from_store`) is bit-identical by
    # construction
    impacts = (
        guarded.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            "_doc",
            F.round(_bm25_impact(k1, b), round_digits)
            .cast("decimal(28,12)")
            .alias("_impact"),
        )
    )
    return _bm25_rank(impacts, q_terms, k, id_col, query_id_col)


def proximity_pair_topk(
    positions: DataFrame,
    pairs: DataFrame,
    k: int = 5,
) -> DataFrame:
    """PROXIMITY ranking from the positional postings — the IR
    operator between exact phrase match and bag-of-words BM25
    (Clarke/Metzler term-dependence family; Lucene's analogue is the
    sloppy PhraseQuery): for each queried (term_a, term_b) pair,
    rank the documents containing BOTH terms by the MINIMAL token
    distance between an occurrence of a and an occurrence of b
    (`min_gap` = min |pos_a − pos_b|, ties → doc asc), top-k per
    pair. Serves entirely from the maintained `pos` satellite
    (`streaming/index.py` POS_SCHEMA rows) or its bucketed serving
    export — the corpus is never re-tokenized.

    NOT the quadratic |occ_a| × |occ_b| pairing: both terms'
    occurrences merge into one per-(pair, doc) position-sorted
    sequence, and the minimum opposite-term gap is provably achieved
    by two occurrences ADJACENT in that order (any occurrence
    strictly between a closest (a, b) pair would itself form a
    strictly closer opposite pair with one of its endpoints — both
    terms' positions are distinct per doc, one term per position),
    so one `lag` window over the merged rows finds it in O(n log n).
    Both-terms-present is enforced by requiring an opposite-tag
    adjacency to exist (a one-sided doc yields no candidate gaps).

    Scale shape: the pair list is query-sized and broadcasts twice
    (once per side); the positional relation streams once behind the
    semi-probe implied by the inner joins (feed it PRUNED serving
    buckets and the scan reads |query terms| partitions); the window
    keys on (pair, doc) — the merged occurrence rows of the queried
    terms only, never the corpus. Ranking reuses the row_number
    top-k, map-side-combinable shape.

    Cites reference scope: DBO-DKFZ/PatientDataIntegration has no
    retrieval tier; north-star extension (SURVEY §2 Ext)."""
    pr = pairs.select("term_a", "term_b").distinct()
    occ_a = positions.join(
        F.broadcast(pr), positions["term"] == pr["term_a"]
    ).select("term_a", "term_b", "doc", "pos", F.lit(0).alias("_side"))
    occ_b = positions.join(
        F.broadcast(pr), positions["term"] == pr["term_b"]
    ).select("term_a", "term_b", "doc", "pos", F.lit(1).alias("_side"))
    merged = occ_a.unionByName(occ_b)
    w = Window.partitionBy("term_a", "term_b", "doc").orderBy("pos")
    gaps = (
        merged.withColumn("_ppos", F.lag("pos").over(w))
        .withColumn("_pside", F.lag("_side").over(w))
        .filter(
            F.col("_pside").isNotNull() & (F.col("_pside") != F.col("_side"))
        )
        .select(
            "term_a",
            "term_b",
            "doc",
            (F.col("pos") - F.col("_ppos")).alias("_gap"),
        )
    )
    best = gaps.groupBy("term_a", "term_b", "doc").agg(
        F.min("_gap").cast("bigint").alias("min_gap")
    )
    rw = Window.partitionBy("term_a", "term_b").orderBy(
        F.col("min_gap").asc(), F.col("doc").asc()
    )
    return (
        best.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= k)
        .select("term_a", "term_b", "doc", "min_gap", "rnk")
    )
