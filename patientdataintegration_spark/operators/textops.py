"""Text analysis operators for large-scale training-data pipelines
(north-star extension, BASELINE.json; not in the reference —
SURVEY.md §7 phase 6).

All operators are native Column expressions over the `documents`
table: tokenization via `split`, counting via higher-order array
functions (`filter`, `transform`), fingerprints via `md5`. No
Python UDFs — everything stays in whole-stage codegen and scales
linearly with a single scan, no shuffle at all for the per-document
operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from patientdataintegration_spark.plans.partitioning import fan_out

# Tiny marker-word lists for the heuristic language scorer. On real
# corpora these would be per-language frequency profiles; the
# mechanism (per-language token-hit ratio + argmax) is the operator.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "que"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the reference's corpora are opaque to
    us; a BPE-ish regex split is `split(text, '[^a-z0-9]+')`)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def marker_hits(toks: Column, markers: Sequence[str]) -> Column:
    """# tokens in the marker list — `size(filter(tokens, in-list))`."""
    lit_markers = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_markers, t)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: length, token count, mean token
    length, stopword ratio. One scan, zero shuffles."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    return (
        df.withColumn("n_chars_calc", F.length(t).cast("bigint"))
        .withColumn("n_tokens", n_tok.cast("bigint"))
        .withColumn(
            "avg_token_len",
            (F.length(t) - (n_tok - 1)) / n_tok,
        )
        .withColumn(
            "stopword_ratio",
            marker_hits(toks, STOPWORDS) / n_tok,
        )
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: per-language marker-hit ratio, argmax
    as prediction (first language in LANG_MARKERS order wins ties)."""
    toks = tokens(F.col(text_col))
    out = df
    for lang, markers in LANG_MARKERS.items():
        out = out.withColumn(
            f"score_{lang}", marker_hits(toks, markers) / F.size(toks)
        )
    # chained argmax, first language in declaration order wins ties
    langs = list(LANG_MARKERS)
    pred: Column | None = None
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for o in langs[i + 1 :]:
            c = F.col(f"score_{lang}") >= F.col(f"score_{o}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit(langs[-1]))
    return out.withColumn("lang_pred", pred)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every positional word k-gram, slide a window of
    `w` consecutive hashes, keep each window's minimum; the distinct
    minima are the fingerprint set. Guarantees any shared run of
    k+w-1 words between two documents shares a fingerprint.

    All per-document: one fan_out'd scan, zero shuffles before the
    explode. Hashes are md5-derived (engine-portable, oracle-
    checkable). Docs shorter than k tokens emit no rows; docs with
    fewer than `w` grams emit their single global minimum.
    """

    def fps_of(tk):
        n_grams = F.size(tk) - F.lit(k - 1)
        grams = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ", *[F.element_at(tk, (i + j).cast("int")) for j in range(k)]
                        )
                    ),
                    1,
                    14,
                ),
                16,
                10,
            ).cast("bigint"),
        )
        # bind the gram-hash array once before windowing over it
        def windows_of(hs):
            mins = F.transform(
                F.sequence(F.lit(1), F.size(hs) - F.lit(w - 1)),
                lambda s: F.array_min(F.slice(hs, s, w)),
            )
            return F.when(F.size(hs) >= w, F.array_distinct(mins)).otherwise(
                F.array(F.array_min(hs))
            )

        wins = F.element_at(F.transform(F.array(grams), windows_of), 1)
        return F.when(n_grams >= 1, wins).otherwise(F.array().cast("array<bigint>"))

    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    fps = F.element_at(F.transform(F.array(toks), fps_of), 1)
    base = fan_out(df.select(id_col, text_col)).select(id_col, fps.alias("fps"))
    return base.select(id_col, F.explode("fps").alias("fp"))


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 over the
    whitespace-normalized lowercased text. md5 (not Spark `hash`) so
    fingerprints are stable across engines and Spark versions."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.md5(norm))


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 9,
) -> DataFrame:
    """Top-k terms per document by tf-idf (tf * ln(N/df)).

    Plan: one explode → (doc, term) hash agg (tf), a second agg on
    term (df — shuffles only distinct (doc,term) pairs thanks to
    partial aggregation), the corpus size N as a broadcast 1-row
    frame, then a per-doc top-k window. idf uses raw ln(N/df) —
    rounded because libm implementations may differ in the last ulp
    across engines."""
    toks = fan_out(df.select(id_col, text_col)).select(
        id_col, F.explode(tokens(F.lower(F.trim(F.col(text_col))))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), round_digits),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "tfidf", "rnk")
    )
