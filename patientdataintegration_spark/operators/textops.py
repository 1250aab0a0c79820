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


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step
    of an LLM training/RAG pipeline: token windows of `chunk_size`
    with `overlap` tokens shared between consecutive chunks.

    Chunk i covers tokens [i*stride, i*stride + chunk_size) with
    stride = chunk_size - overlap; the last chunk may be short; a doc
    shorter than one chunk emits exactly one chunk. Pure per-row
    higher-order array expressions (token array bound once via the
    one-element-transform idiom) — one scan, zero shuffle, rows fan
    out ~n_tokens/stride per document.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap

    def chunks_of(tk: Column) -> Column:
        n = F.size(tk)
        # highest chunk index: floor((max(n - overlap, 1) - 1) / stride)
        last_idx = F.floor((F.greatest(n - F.lit(overlap), F.lit(1)) - 1) / F.lit(stride))
        return F.transform(
            F.sequence(F.lit(0), last_idx.cast("int")),
            lambda i: F.struct(
                i.alias("chunk_id"),
                F.concat_ws(" ", F.slice(tk, i * stride + 1, chunk_size)).alias(
                    "chunk_text"
                ),
                F.size(F.slice(tk, i * stride + 1, chunk_size)).alias("n_chunk_tokens"),
            ),
        )

    toks = tokens(F.lower(F.trim(F.col(text_col))))
    packed = F.element_at(F.transform(F.array(toks), chunks_of), 1)
    return (
        fan_out(df.select(id_col, text_col))
        .select(id_col, F.explode(packed).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").cast("bigint").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_chunk_tokens").cast("bigint").alias("n_chunk_tokens"),
        )
    )


def token_rarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_threshold: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Corpus-statistics quality scoring — unigram-LM surprisal: each
    document's mean token log-probability under the corpus unigram
    distribution, plus its count of rare tokens (corpus frequency <
    `rare_threshold`, hapax-family signal). Low avg_logprob = unusual
    token mix (boilerplate, noise, wrong-language); the classic cheap
    LM-quality gate before perplexity models.

    Plan: one explode → (token) corpus-count agg (partial-aggregated;
    shuffle is O(vocab)), corpus total as a broadcast 1-row frame,
    then a (doc, token) join back and a per-doc agg. The (doc,token)
    join is the big shuffle — both sides hash on token, and no
    executor ever holds more than one token's postings."""
    toks = fan_out(df.select(id_col, text_col)).select(
        id_col, F.explode(tokens(F.lower(F.trim(F.col(text_col))))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    scored = toks.join(counts, "tok").crossJoin(F.broadcast(total))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # per-token ln rounded to 6 digits THEN summed as exact
            # decimal: order-independent across partitionings/engines
            # (a raw double sum is not, and at 9 digits a last-ulp
            # libm ln difference can still flip the round at corpus
            # vocabulary sizes); one double division at the end
            F.round(
                F.sum(
                    F.round(F.log(F.col("c") / F.col("t")), 6).cast("decimal(28,12)")
                ).cast("double")
                / F.count(F.lit(1)),
                round_digits,
            ).alias("avg_logprob"),
            F.sum((F.col("c") < rare_threshold).cast("bigint")).alias("n_rare"),
        )
        .withColumn("rare_ratio", F.col("n_rare") / F.col("n_tokens"))
    )


def contamination_check(
    candidates: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination check — the train/test leakage audit an
    LLM data pipeline runs before training: for every candidate
    document, the fraction of its word n-gram shingles that appear
    ANYWHERE in the benchmark set.

    Plan: shingle both sides (distinct within doc), distinct the
    benchmark side down to a shingle-hash set (tiny relative to the
    corpus — O(unique benchmark shingles)), LEFT JOIN candidates'
    shingles against it, per-doc agg. The join hashes on the 8-byte
    shingle hash, never text; at 100 TB the benchmark side is
    broadcastable or bucketed."""
    from patientdataintegration_spark.operators.dedup import shingle_table

    cand = shingle_table(candidates, text_col=text_col, id_col=id_col, n=n)
    bench = (
        shingle_table(benchmark, text_col=text_col, id_col=id_col, n=n)
        .select("shingle_hash")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = cand.join(bench, "shingle_hash", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
        .withColumn(
            "contamination", F.col("n_contaminated") / F.col("n_shingles")
        )
    )


def _grams(text: Column, n: int) -> Column:
    """All word n-gram occurrences of a document, duplicates KEPT
    (unlike `dedup.word_shingles`, which is distinct-per-doc) —
    repetition signals need the occurrence counts. Same lambda-binding
    trick: the token array is bound once via a one-element transform
    so the per-gram lambda doesn't re-tokenize per element."""

    def gram_of(tk: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1))
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(tk, (i + j).cast("int")) for j in range(n)]
            ),
        )
        return F.when(F.size(tk) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    toks = F.split(F.lower(F.trim(text)), " ")
    return F.element_at(F.transform(F.array(toks), gram_of), 1)


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition quality signals, the Gopher-rule
    family an LLM pipeline filters on before training: the fraction
    of tokens taken by the most common token, the fraction of n-gram
    occurrences taken by the top n-gram, and the duplicate n-gram
    occurrence fraction (1 - distinct/total) for n = 2, 3.

    All outputs are ratios of exact integer counts — one IEEE
    division each, so bit-identical across engines with no rounding.

    Plan: ONE scan; the three gram streams (tokens, 2-grams, 3-grams)
    are concatenated into a single tagged array and exploded once, so
    the input is never re-read. Then (doc, k, gram) partial-aggregated
    counts — the only wide shuffle, keyed on (doc, k, gram), no skew
    beyond document size — and a per-doc conditional agg. O(tokens)
    rows shuffled per document; nothing quadratic anywhere."""
    def _tag(k: int):
        # NOT `lambda g, k=k`: a two-parameter lambda makes
        # F.transform bind (element, index), clobbering the default
        return lambda g: F.struct(F.lit(k).alias("k"), g.alias("gram"))

    tagged = F.concat(
        *[F.transform(_grams(F.col(text_col), k), _tag(k)) for k in (1, 2, 3)]
    )
    g = fan_out(df.select(id_col, text_col)).select(
        id_col, F.explode(tagged).alias("t")
    ).select(id_col, F.col("t.k").alias("k"), F.col("t.gram").alias("gram"))
    c = g.groupBy(id_col, "k", "gram").agg(F.count(F.lit(1)).alias("c"))

    def _sum(k: int) -> Column:
        return F.sum(F.when(F.col("k") == k, F.col("c")))

    def _max(k: int) -> Column:
        return F.max(F.when(F.col("k") == k, F.col("c")))

    def _distinct(k: int) -> Column:
        return F.count(F.when(F.col("k") == k, F.lit(1)))

    return c.groupBy(id_col).agg(
        _sum(1).cast("bigint").alias("n_tokens"),
        (_max(1) / _sum(1)).alias("top_token_frac"),
        (_max(2) / _sum(2)).alias("top_2gram_frac"),
        ((_sum(2) - _distinct(2)) / _sum(2)).alias("dup_2gram_frac"),
        ((_sum(3) - _distinct(3)) / _sum(3)).alias("dup_3gram_frac"),
    )


def vocab_coverage(
    df: DataFrame, text_col: str = "text", top_n: int = 200
) -> DataFrame:
    """Vocabulary-induction analysis: the `top_n` most frequent
    tokens with their corpus counts and the CUMULATIVE share of all
    token occurrences they cover — the curve that sizes a tokenizer
    vocabulary ("how many types cover 95% of tokens?").

    One scan + one explode + one hash agg on token. The global
    ranking window never sees the full type table (at 100 TB the
    vocabulary is tens of millions of types — a single-partition
    sort over it is the bottleneck): each partition first keeps its
    LOCAL top_n (any global top-n row is necessarily in its own
    partition's top-n, so no winner can be pruned), and the
    single-reducer window ranks only ≤ partitions×top_n candidate
    rows. The total-occurrence denominator is a broadcast 1-row
    aggregate over the UNPRUNED counts, so cum_share is exact. The
    candidate set varies with partition layout but the ranked output
    is layout-invariant (q49's global-top-k argument). Ties rank
    deterministically by token string (binary collation in both
    Spark and the oracle).
    """
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("tot"))
    local_w = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.desc("cnt"), F.asc("token")
    )
    cand = (
        counts.withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= top_n)
        .drop("_lr")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = cand.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        F.row_number().over(w).alias("rank"),
        (
            F.sum("cnt")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            / F.col("tot").cast("double")
        ).alias("cum_share"),
    )
    return ranked.filter(F.col("rank") <= top_n)


def sparse_cosine_pairs(
    df: DataFrame,
    min_sim: float = 0.3,
    min_df: int = 2,
    max_df: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """All-pairs document cosine similarity over tf-idf vectors via
    the term-partitioned sparse dot-product join (a.k.a. the
    inverted-index similarity join): pairs are generated ONLY through
    shared terms, never by a doc×doc cross product.

    Scale shape: one explode → (doc, term, tf) agg; document
    frequency prunes the vocabulary to `min_df <= df <= max_df` —
    df=1 terms cannot produce a pair (pure cost), and high-df terms
    are BOTH stop-word noise and the quadratic blow-up axis (a term
    in f docs yields f² partials), so the cap is the scale guard
    exactly like the shingle cap in n-gram dedup. The self-join
    shuffles on the term key; per-term fan-out is bounded by
    max_df², and the (a,b) dot aggregation partial-aggregates
    map-side.

    Exactness: weights are ln-idf doubles rounded to 9 digits (the
    q46 contract); per-term partial products are cast to
    DECIMAL(30,15) before summing so the dot and the norms are
    order-independent and engine-exact; the final similarity is one
    deterministic double division + sqrt, rounded.

    Cosine is defined over the PRUNED vector space (kept terms only)
    — the standard convention once stop-words are dropped.

    Output: (doc_a, doc_b, cos_sim) with doc_a < doc_b and
    cos_sim >= min_sim.
    """
    toks = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col).alias("_doc"),
        F.explode(tokens(F.lower(F.trim(F.col(text_col))))).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("_doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_doc",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
                9,
            ).alias("w"),
        )
    )
    norms = w.groupBy("_doc").agg(
        F.sum((F.col("w") * F.col("w")).cast("decimal(30,15)")).alias("norm2")
    )
    a = w.select(F.col("_doc").alias("doc_a"), "term", F.col("w").alias("w_a"))
    b = w.select(F.col("_doc").alias("doc_b"), "term", F.col("w").alias("w_b"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum((F.col("w_a") * F.col("w_b")).cast("decimal(30,15)")).alias("dot"))
    )
    na = norms.select(F.col("_doc").alias("doc_a"), F.col("norm2").alias("na"))
    nb = norms.select(F.col("_doc").alias("doc_b"), F.col("norm2").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                round_digits,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_sim)
    )


def paragraph_dedup_stats(
    df: DataFrame,
    para_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Paragraph-level duplication signals — the C4/RefinedWeb-style
    boilerplate detector: split each document into non-overlapping
    `para_tokens`-token paragraphs, fingerprint each (md5), and score
    every document by how many of its paragraphs also appear in at
    least one OTHER document.

    Scale shape: paragraph fanout is one scan (array slicing, no
    shuffle), then ONE shuffle on the 128-bit fingerprint for the
    cross-corpus frequency, and one join back + doc aggregation. The
    fingerprint table is the only O(paragraphs) shuffle — 32 bytes a
    row regardless of paragraph text size, the same discipline as
    exact doc-level dedup.

    Output: (doc_id, n_paras, n_dup_paras, dup_ratio).
    """
    paras = chunk_documents(
        df, chunk_size=para_tokens, overlap=0, text_col=text_col, id_col=id_col
    ).select(F.col(id_col), F.md5(F.col("chunk_text")).alias("h"))
    freq = paras.groupBy("h").agg(F.count_distinct(F.col(id_col)).alias("nd"))
    dup = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        paras.join(freq, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(dup).cast("bigint").alias("n_dup_paras"),
            F.round(
                F.sum(dup).cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("dup_ratio"),
        )
    )


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 4,
) -> DataFrame:
    """Byte-pair-encoding MERGE TRAINING — the iterative core of the
    tokenizer-building stage every LLM data pipeline runs before
    anything else: repeatedly find the most frequent ADJACENT symbol
    pair (weighted by word frequency) and fuse it into one symbol.
    Returns the learned merge table (step, left, right, pair_count)
    — n_merges rows, the artifact a tokenizer ships.

    Distribution shape (the part that matters at 100 TB): the corpus
    is reduced ONCE to its word-frequency VOCABULARY (one scan +
    one vocab-sized shuffle — the classic Sennrich formulation works
    on the vocab, never the corpus), and every iteration is
    vocab-sized: explode adjacent pairs, one map-side-combined count,
    pick the argmax, rewrite the vocab's symbol strings with ONE
    literal replace. The per-iteration argmax is a single-row
    plan-time readout (the q252/profiled_n_salts frozen-readout
    discipline — an iterative algorithm's step-i+1 PLAN depends on
    step i's result by nature); the vocab localCheckpoints each
    round so the lineage stays flat (the kmeans/pagerank iteration
    discipline).

    Exactness/portability: words are restricted to ^[a-z]+$ (the
    standard pre-tokenizer split), symbols ride a DOUBLE-SPACE-framed
    string — '  a  b  c  ' — where fusing (a, b) is the literal
    replace of ' a  b ' by ' ab ': left-to-right non-overlapping
    resume-after-replacement semantics are IDENTICAL in Spark and
    DuckDB (probed), and consuming one space of each outer pair keeps
    the framing invariant, so 'a a a' fuses to ('aa', 'a') exactly
    like the reference BPE fold. Ties break by (count DESC, left,
    right) — ascii-lowercase strings, binary collation both engines.
    Integer counts end to end; the q264 oracle replays every step as
    an unrolled CTE."""
    spark = docs.sparkSession
    out_rows, _ = _bpe_train(docs, text_col, n_merges)
    return spark.createDataFrame(
        out_rows,
        "step int, merge_left string, merge_right string, pair_count bigint",
    )


def bpe_token_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 4,
    top_k: int = 20,
) -> DataFrame:
    """BPE APPLY — tokenize the corpus with the merge table
    `bpe_merges` learns (train + apply in one call so the trained
    vocab is reused, not recomputed) and return the top-k tokens by
    total corpus occurrence (token, n_occurrences). This is the
    artifact check a tokenizer build ends with: after n merges, what
    does the unit inventory look like and how much mass did the
    merges capture. Token occurrences are vocab-side — each word's
    token multiset weighted by the word's corpus frequency — so the
    apply never rescans the corpus either. The LIMIT rides a
    provably-unique ORDER BY (count DESC, token — token is the group
    key); integer counts end to end (the q267 oracle extends q264's
    unrolled CTEs with the final replace + explode + count)."""
    _, framed = _bpe_train(docs, text_col, n_merges)
    toks = F.filter(F.split(F.col("s"), "  "), lambda x: x != F.lit(""))
    return (
        framed.select(F.explode(toks).alias("token"), "wc")
        .groupBy("token")
        .agg(F.sum("wc").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(top_k)
    )


def _bpe_train(
    docs: DataFrame, text_col: str, n_merges: int
) -> tuple[list, DataFrame]:
    """Shared trainer: returns (merge rows, final framed vocab)."""
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
    )
    framed = words.select(
        F.concat(
            F.lit("  "),
            F.array_join(F.split(F.col("w"), ""), "  "),
            F.lit("  "),
        ).alias("s"),
        "wc",
    ).localCheckpoint()

    out_rows = []
    for step in range(1, int(n_merges) + 1):
        toks = F.filter(F.split(F.col("s"), "  "), lambda x: x != F.lit(""))
        # single-row argmax readout: step i+1's replace LITERAL is a
        # plan constant derived from step i (frozen-readout pattern)
        best = (
            pairs_from_framed(framed, toks)
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        out_rows.append((step, l, r, int(cnt)))
        framed = framed.select(
            F.replace(
                F.col("s"), F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
            ).alias("s"),
            "wc",
        ).localCheckpoint()
    return out_rows, framed


def pairs_from_framed(framed: DataFrame, toks: Column) -> DataFrame:
    """Adjacent-symbol pair counts (l, r, cnt) of a framed-vocab
    relation — one explode + one map-side-combined sum per call."""
    return (
        framed.select(toks.alias("_toks"), "wc")
        .select(
            F.explode(
                # size guard: Spark's sequence(1, 0) is DESCENDING
                # [1, 0], not empty — unguarded, a single-symbol word
                # would emit a (last, NULL) phantom pair
                F.expr(
                    "CASE WHEN size(_toks) >= 2 THEN"
                    " transform(sequence(1, size(_toks) - 1),"
                    " i -> struct(_toks[i-1] AS l, _toks[i] AS r))"
                    " ELSE CAST(array() AS ARRAY<STRUCT<l: STRING, r: STRING>>)"
                    " END"
                )
            ).alias("p"),
            "wc",
        )
        .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "wc")
        .groupBy("l", "r")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
    )
