"""Seeded per-group sampling (SURVEY.md §2.6 W1; reference
`dataset_classes_v1.py:44-48` — `random.sample(tiles, min(len, n))`
per slide with a fixed seed).

Python's `random.sample` picks are RNG-implementation-specific, so
the contract here is the documented equivalence class (SURVEY.md §7
hard part (c)): a *seed-stable, partitioning-independent* n-per-group
sample. The draw order comes from `pseudo_random` (pure key
arithmetic, engine-portable) rather than `rand(seed)` (whose draws
depend on the physical partition layout — a silent repro hazard at
scale where partitioning changes run-to-run).

Physical plan: one shuffle on the group key for the window, then
`row_number() <= n`. At 100 TB this is the same single shuffle any
per-group top-n costs; the filter removes rows before anything wide
(e.g. image bytes) is materialized — the reference's "sample before
decode" pushdown (SURVEY.md §4.1) falls out of Spark's column
pruning as long as sampling precedes use of the wide column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from patientdataintegration_spark.functions.deterministic import pseudo_random


def sample_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    n: int,
    key_cols: Sequence[str],
    seed: int = 42,
    keep_rank: bool = False,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep a deterministic pseudo-random sample of `n` rows per group.

    `key_cols` (1 or 2 numeric key columns unique within the group)
    drive the deterministic draw. Groups smaller than `n` keep all
    rows — matching `min(len(group), n)` in the reference.

    If `key_cols` is NOT unique within a group (the draw ties),
    row_number's pick among tied rows is engine-/partitioning-
    arbitrary; pass `tiebreak_cols` covering the carried attributes
    to make the order total. Rows identical across keys AND
    tiebreaks remain interchangeable — which by definition cannot
    change any downstream result.
    """
    keys = [F.col(k) for k in key_cols]
    draw = pseudo_random(keys[0], keys[1] if len(keys) > 1 else None, seed=seed)
    w = Window.partitionBy(*group_cols).orderBy(
        draw.asc(), *[k.asc() for k in keys], *[F.col(t).asc() for t in tiebreak_cols]
    )
    out = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n)
    return out if keep_rank else out.drop("_rn")


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic downsample of a corpus to a per-group TOKEN
    budget — the "mix N billion tokens per source" step of assembling
    a training set. Documents are ordered by a seeded engine-portable
    hash of their id (so the subset is a uniform sample, stable
    across runs, engines, and partitionings) and kept while the
    group's running token total stays within `budget_tokens`. The
    first document of a group is always kept, so every group is
    represented even when one document overshoots the budget.

    Plan: one shuffle on the group key for the running-sum window.
    Token counts ride along as one long per row; document text is
    pruned before the shuffle. Group skew (one giant source) is the
    same skew any per-source window costs — at 100 TB, salt the
    running sum with a two-level scan (per-salt partials, then a
    broadcast prefix offset) if one source dominates.
    """
    from patientdataintegration_spark.operators.textops import token_count

    base = df.select(
        id_col,
        group_col,
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    draw = pseudo_random(F.col(id_col), seed=seed)
    w = (
        Window.partitionBy(group_col)
        .orderBy(draw.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return out.filter(
        (F.col("cum_tokens") <= budget_tokens)
        | (F.col("cum_tokens") == F.col("n_tokens"))
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Concat-and-chop sequence packing: the step that turns a
    filtered corpus into fixed-length training sequences. Documents
    are laid end-to-end per group in a deterministic seeded-hash
    order and the concatenation is chopped every `seq_len` tokens;
    each document learns which pack it starts in (`pack_id`), at
    what offset (`pack_offset`), and how many packs it straddles
    (`packs_spanned`) — the manifest a loader needs to materialize
    token windows without re-reading the corpus.

    All outputs are pure integer arithmetic over an exact running
    sum — bit-identical across engines and partitionings.

    Plan: identical shape to `token_budget_sample` — one shuffle on
    the group key for the running-sum window, text pruned before the
    shuffle. Per-group sequential scan is the algorithm's nature
    (packing is order-defined); at 100 TB the group is a corpus
    shard, not the whole corpus, so each window stays bounded.
    """
    from patientdataintegration_spark.operators.textops import token_count

    base = df.select(
        id_col,
        group_col,
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    draw = pseudo_random(F.col(id_col), seed=seed)
    w = (
        Window.partitionBy(group_col)
        .orderBy(draw.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")  # tokens before this doc
    pack_id = F.floor(start / F.lit(seq_len)).cast("bigint")
    last_pack = F.floor((cum - F.lit(1)) / F.lit(seq_len)).cast("bigint")
    return base.select(
        id_col,
        group_col,
        "n_tokens",
        pack_id.alias("pack_id"),
        (start % F.lit(seq_len)).cast("bigint").alias("pack_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(1))
        .otherwise(last_pack - pack_id + F.lit(1))
        .cast("bigint")
        .alias("packs_spanned"),
    )


def weighted_sample_per_group(
    df: DataFrame,
    n: int = 5,
    weight_col: str = "n_chars",
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, n rows per
    group — the Efraimidis–Spirakis A-ES scheme: each row draws a
    deterministic uniform u from its key, gets priority
    ``-ln(u) / weight`` (an exponential with rate = weight), and the
    n SMALLEST priorities per group win. Inclusion probability is
    proportional to weight, and the result is identical for any
    partitioning, engine, or run (the same engine-portable
    pseudo-randomness as seeded sampling W1).

    Scale shape: one shuffle on the group key for the top-n window —
    no global sort, no driver collect; at 100 TB a window top-n
    partial-aggregates per partition before the shuffle under AQE.
    Zero-weight rows are excluded (their priority would be +inf).

    Output: the sampled rows' (group, id, weight, priority rank).
    """
    u = (pseudo_random(F.col(id_col), seed=seed) + F.lit(1)).cast("double") / F.lit(
        1_000_000_008.0
    )
    # rounded to 12 digits before ranking: ln() can differ in the last
    # ulp between libm implementations (Spark JVM vs an oracle engine),
    # which could flip the order of two near-equal priorities — the
    # same fixed-digit normalization every other FP output here uses
    prio = F.round(-F.log(u) / F.col(weight_col).cast("double"), 12)
    base = df.filter(F.col(weight_col) > 0).select(
        F.col(group_col),
        F.col(id_col),
        F.col(weight_col).cast("bigint").alias("weight"),
        prio.alias("_prio"),
    )
    w = Window.partitionBy(group_col).orderBy(F.col("_prio").asc(), F.col(id_col).asc())
    return (
        base.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n)
        .select(group_col, id_col, "weight", "rnk")
    )
