"""Source-mixture reweighting for training-data curricula.

A pretraining corpus is a MIXTURE of sources (web crawl, code,
papers, ...), and the trained-on distribution rarely matches the
on-disk distribution — the pipeline computes per-source sampling
weights that realize a target token share, capped so no source is
repeated more than `max_epochs` times (the standard guard against
upsampling a tiny source into memorization).

Shape at 100 TB: one scan computes per-source token counts (hash
agg, map-side combined); the weights table is O(#sources) rows — a
driver-sized frame every downstream sampler broadcasts. The window
over the unpartitioned per-source frame is safe for the same
reason: it moves #sources rows, never data.

Weights feed `sampling.seeded_sample`-style deterministic document
selection (weight >= 1 duplicates epochs; fractional remainder
selects by hash threshold), so a run is reproducible bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from patientdataintegration_spark.operators.textops import tokens


def mixture_weights(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    max_epochs: float = 4.0,
) -> DataFrame:
    """Per-source stats + the sampling weight that would equalize
    token share across sources (uniform target), capped at
    `max_epochs`.

    Returns (source, n_docs, n_tokens, natural_share, weight,
    target_tokens). All ratios are single IEEE divisions of exact
    integers — bit-identical across engines and partitionings.
    """
    per = (
        docs.select(F.col(source_col).alias("source"), tokens(F.col(text_col)).alias("t"))
        .select("source", F.size("t").alias("nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w)
    nsrc = F.count(F.lit(1)).over(w)
    weight = F.least(
        F.lit(float(max_epochs)),
        (total.cast("double") / nsrc) / F.col("n_tokens"),
    )
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / total).alias("natural_share"),
        weight.alias("weight"),
        (weight * F.col("n_tokens")).alias("target_tokens"),
    )


def realize_mixture(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 42,
) -> DataFrame:
    """Materialize the weighted sample: every document appears
    floor(weight) times (full epochs) plus once more with
    probability frac(weight), selected by the engine-portable
    integer hash — so the realized training set is identical across
    runs, engines, and partitionings (never `rand()`).

    The weights frame is O(#sources) and broadcast; the epoch
    explode multiplies rows by at most ceil(max_epochs), which is
    the intended oversampling, not overhead. Returns
    (id, source, epoch) rows — the draw order for the packer.
    """
    from patientdataintegration_spark.functions.deterministic import (
        MODULUS as PR_MODULUS,
    )
    from patientdataintegration_spark.functions.deterministic import pseudo_random

    w = weights.select(F.col("source").alias("__w_source"), "weight")
    j = docs.select(id_col, F.col(source_col).alias("source")).join(
        F.broadcast(w), F.col("source") == F.col("__w_source")
    )
    n_full = F.floor("weight").cast("int")
    frac = F.col("weight") - F.floor("weight")
    exploded = j.select(
        id_col,
        "source",
        "weight",
        F.explode(F.sequence(F.lit(0), n_full)).alias("epoch"),
    )
    draw = pseudo_random(F.col(id_col), F.col("epoch"), seed=seed)
    keep = (F.col("epoch") < F.floor("weight")) | (
        draw < frac * F.lit(PR_MODULUS)
    )
    return exploded.filter(keep).select(id_col, "source", "epoch")
