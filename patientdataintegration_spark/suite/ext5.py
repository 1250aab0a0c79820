"""Round-6 batch: the embedding near-dup dedup pipeline end to end
(q207 — planted-duplicate construction, banded SRP candidates, exact
cosine, components, canonical keep-list) plus classic decision-
support plan shapes the registry had not yet exercised (multi-level
EXISTS/NOT-EXISTS q208, scalar-subquery anti-join q209, exact
grouped medians q210, join-key skew audit q211, the native pivot API
q212, correlated-average filter q213).

Same exactness contract as `suite/core.py` (decimal sums, single
IEEE divisions with identical parenthesisation, unique ORDER BY
under every LIMIT); the q207 cosine rides the sequential-fold
discipline proven by q36/q192.

Scale stance (100 TB): q207 never enumerates the quadratic pair
space (banded equi-joins, ~1% background collision rate at the
2x8-bit defaults); q208/q213 aggregate before they join; q211 is
the diagnostic you run BEFORE choosing a salting strategy; nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from patientdataintegration_spark.sources.catalog import load_table
from patientdataintegration_spark.suite.ext4 import _srp_signs

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# --- embedding-cosine near-duplicate dedup (planted-dup pipeline) -----------

_NEARDUP_K = 16  # SRP hyperplanes: 2 bands x 8 bits
_NEARDUP_BANDS = 2
_NEARDUP_MIN_COS = 0.98
_PLANT_OFFSET = 10_000_000

# corpus = embeddings (as doubles) + a deterministic near-duplicate
# planted for every 10th vector (dim 0 shifted by +0.02 AFTER the
# float->double cast, so both engines compute the identical double).
_CORPUS_SQL = f"""
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + {_PLANT_OFFSET},
             list_transform(range(1, len(embedding) + 1),
               i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) + 0.02
                         ELSE CAST(embedding[i] AS DOUBLE) END)
      FROM embeddings WHERE vec_id % 10 = 0
"""


def _q207_sql() -> str:
    signs = _srp_signs(k=_NEARDUP_K)
    r = _NEARDUP_K // _NEARDUP_BANDS
    projs = []
    for j in range(_NEARDUP_K):
        lit = "[" + ", ".join(str(s) for s in signs[j]) + "]"
        projs.append(
            f"CASE WHEN list_reduce(list_transform(range(1, len(v) + 1), "
            f"i -> v[i] * ({lit})[i]), (x, y) -> x + y) >= 0 "
            f"THEN 1 ELSE 0 END AS bit{j}"
        )
    bands = [
        " + ".join(f"bit{b * r + i} * {1 << i}" for i in range(r))
        + f" AS band{b}"
        for b in range(_NEARDUP_BANDS)
    ]
    cand_unions = "\n      UNION ".join(
        f"SELECT a.vec_id AS vec_a, c.vec_id AS vec_b "
        f"FROM banded a JOIN banded c "
        f"ON a.band{b} = c.band{b} AND a.vec_id < c.vec_id"
        for b in range(_NEARDUP_BANDS)
    )
    fold = (
        "list_reduce(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )
    dotab = fold.format(a="ea.v", b="eb.v")
    dotaa = fold.format(a="ea.v", b="ea.v")
    dotbb = fold.format(a="eb.v", b="eb.v")
    projs_sql = ",\n             ".join(projs)
    bands_sql = ", ".join(bands)
    return f"""
    WITH RECURSIVE corpus AS ({_CORPUS_SQL}),
    bits AS (
      SELECT vec_id, v,
             {projs_sql}
      FROM corpus
    ),
    banded AS (SELECT vec_id, {bands_sql} FROM bits),
    cand AS (
      {cand_unions}
    ),
    pairs AS (
      SELECT vec_a, vec_b
      FROM cand
      JOIN corpus ea ON ea.vec_id = vec_a
      JOIN corpus eb ON eb.vec_id = vec_b
      WHERE round({dotab} / (sqrt({dotaa}) * sqrt({dotbb})), 4) + 0.0
            >= {_NEARDUP_MIN_COS}
    ),
    edges AS (
      SELECT vec_a AS src, vec_b AS dst FROM pairs
      UNION SELECT vec_b, vec_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS label FROM reach GROUP BY node),
    labeled AS (
      SELECT c.vec_id, COALESCE(p.label, c.vec_id) AS cluster
      FROM corpus c LEFT JOIN comp p ON p.node = c.vec_id
    )
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
           CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT)
             AS cluster_size,
           vec_id = cluster AS is_canonical
    FROM labeled
    """


def _neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    planted = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(_PLANT_OFFSET)).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x.cast("double") + F.lit(0.02)).otherwise(
                x.cast("double")
            ),
        ).alias("v"),
    )
    return base.unionByName(planted)


@_register("q207_embedding_neardup_clusters", _q207_sql())
def q207_embedding_neardup_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-cosine near-duplicate dedup, end to end — the vector
    twin of the q86 text pipeline and the q194 image pipeline, with
    the constructed-duplicate discipline of both: a deterministic
    near-dup (dim 0 shifted +0.02, cosine ~0.999) is PLANTED for
    every 10th vector, then the pipeline must find it blind —
    banded SRP candidates (`similarity.srp_banded_neardup_pairs`,
    2 bands x 8 bits over 16 md5-parity hyperplanes: ~99% collision
    at cosine 0.999 vs ~0.8% background, so the candidate set is
    ~1% of the quadratic pair space), exact sequential-fold cosine
    >= 0.98 on candidates only, min-label connected components
    (`dedup.connected_components`), and the canonical keep-list
    (cluster = smallest member id; is_canonical marks the survivor a
    dedup job would keep). FULLY hash-checked: the oracle replays
    plant -> project -> band -> cosine -> recursive closure in SQL.
    Scale: two band equi-joins + one component join per round, never
    all-pairs; band keys are balanced because SRP bits are
    independent fair coins."""
    from patientdataintegration_spark.operators.dedup import (
        connected_components,
    )
    from patientdataintegration_spark.operators.similarity import (
        srp_banded_neardup_pairs,
    )

    corpus = _neardup_corpus(spark, sf_dir)
    pairs = srp_banded_neardup_pairs(
        corpus,
        signs=_srp_signs(k=_NEARDUP_K),
        n_bands=_NEARDUP_BANDS,
        min_cosine=_NEARDUP_MIN_COS,
        id_col="vec_id",
        vec_col="v",
    )
    comp = connected_components(pairs, "vec_a", "vec_b")
    labeled = corpus.select("vec_id").join(
        comp, corpus.vec_id == comp.node, "left"
    ).select(
        "vec_id", F.coalesce(F.col("label"), F.col("vec_id")).alias("cluster")
    )
    w = Window.partitionBy("cluster")
    return labeled.select(
        "vec_id",
        F.col("cluster").cast("bigint").alias("cluster"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
        (F.col("vec_id") == F.col("cluster")).alias("is_canonical"),
    )


# --- TPC-H Q21 shape: sole late supplier in multi-supplier orders -----------


@_register(
    "q208_sole_late_supplier",
    """
    WITH per_supp AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             SUM(late) AS n_late_supp
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_supp p
    JOIN per_order po ON po.l_orderkey = p.l_orderkey
    JOIN supplier s ON s.s_suppkey = p.l_suppkey
    WHERE p.late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q208_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers
    with a late shipment (> 60 days after the order date) in
    multi-supplier orders where NO OTHER supplier was late. The
    classic EXISTS + NOT-EXISTS pair decorrelated the way Catalyst
    would: ONE (orderkey, suppkey) aggregate computes per-supplier
    lateness, ONE orderkey rollup computes the order's supplier/late
    counts, and the two correlated quantifiers become plain filter
    predicates (n_supp > 1, n_late_supp = 1) — no repeated
    subquery scans of lineitem. Counts are exact integers; s_name is
    unique per supplier (generated as 'Supplier#<key>'), so the
    LIMIT-20 prefix is deterministic. Scale: both aggregates shuffle
    on orderkey (the second reuses the first's output), then one
    broadcast of the supplier dim."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")

    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("late")
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late_supp"),
    )
    return (
        per_supp.filter(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --- TPC-H Q22 shape: rich customers with no orders -------------------------


@_register(
    "q209_rich_idle_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def q209_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with an
    above-average positive balance and NO order since 2000-01-01 —
    the lapsed-high-value list (this corpus gives every customer at
    least one lifetime order, so the classic never-ordered predicate
    would be vacuously empty; the recency cutoff keeps the identical
    plan shape with a non-trivial answer at every SF). The scalar
    AVG subquery is one tiny aggregate cross-joined in (Spark
    broadcasts the single row); NOT EXISTS is a left-anti join on
    custkey over the date-filtered orders — the filter pushes into
    the orders scan BEFORE the anti-join shuffles. Exactness: the
    average routes the balance sum through DECIMAL and divides by
    the exact count ONCE — both engines perform the identical
    cast-then-divide, so the threshold double is bit-identical and
    the > filter agrees on every customer. Scale: anti-join shuffles
    on custkey (orders' natural key); the nation rollup is 25
    groups."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("a")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
    )
    idle = rich.join(
        o, rich.c_custkey == o.o_custkey, "left_anti"
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --- exact grouped median (token counts per language) -----------------------


@_register(
    "q210_token_count_median",
    """
    WITH t AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    r AS (
      SELECT lang, n_tok,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_tok, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM t
    )
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS median_tokens
    FROM r
    WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY lang
    ORDER BY lang
    """,
)
def q210_token_count_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped median without percentile functions — the
    portable formulation: rank rows per group with a deterministic
    tiebreak (n_tok, doc_id), keep the one or two middle positions,
    average them. Spark's `percentile` and DuckDB's `quantile_cont`
    interpolate with engine-specific arithmetic; this shape is pure
    integer ranking plus ONE division of exact integers, so it
    hash-matches bit for bit. Scale: one window shuffle on lang (the
    same sort-within-group every exact quantile needs), then a
    25-group rollup; for a 100 TB corpus with few groups, swap in
    per-group sketches only when approximate is acceptable."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    w = Window.partitionBy("lang").orderBy("n_tok", "doc_id")
    wc = Window.partitionBy("lang")
    r = t.select(
        "lang",
        "n_tok",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    mid = r.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return (
        mid.groupBy("lang")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias(
                "median_tokens"
            ),
        )
        .orderBy("lang")
    )


# --- join-key skew audit -----------------------------------------------------


@_register(
    "q211_join_key_skew",
    """
    WITH per_key AS (
      SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey
    ),
    g AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM per_key
    )
    SELECT p.l_orderkey, CAST(p.cnt AS BIGINT) AS cnt,
           CAST(p.cnt AS DOUBLE) / CAST(g.total AS DOUBLE) AS share,
           CAST(g.max_cnt AS DOUBLE)
             / (CAST(g.total AS DOUBLE) / CAST(g.n_keys AS DOUBLE))
             AS skew_ratio
    FROM per_key p, g
    ORDER BY p.cnt DESC, p.l_orderkey
    LIMIT 10
    """,
)
def q211_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit — the diagnostic a pipeline owner runs
    BEFORE picking a shuffle strategy at 100 TB: per-key row counts
    on the join column, the top heavy hitters with their share of
    the table, and the global skew ratio (max key count over the
    mean). A skew_ratio near 1 means plain hash partitioning is
    fine; large values mean the named keys need salting or AQE
    skew-join handling — this query literally outputs the salting
    candidate list. Exactness: counts are integers; share and
    skew_ratio are divisions of exact integers with identical
    parenthesisation in both engines. Scale: one map-side-combined
    count per key, a single-row global rollup broadcast back, top-10
    via ordered limit (Spark's TakeOrderedAndProject — no full
    sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    g = per_key.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    return (
        per_key.crossJoin(F.broadcast(g))
        .select(
            "l_orderkey",
            F.col("cnt").cast("bigint").alias("cnt"),
            (F.col("cnt").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
            (
                F.col("max_cnt").cast("double")
                / (F.col("total").cast("double") / F.col("n_keys").cast("double"))
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("cnt").desc(), "l_orderkey")
        .limit(10)
    )


# --- native pivot API --------------------------------------------------------


@_register(
    "q212_status_pivot",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q212_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native pivot API (`RelationalGroupedDataset.pivot`) —
    long-to-wide status matrix per order priority. The EXPLICIT
    value list ('F','O','P') matters at scale: without it Spark runs
    a distinct-values collection job over 100 TB before it can even
    plan; with it, the pivot compiles to exactly the conditional
    aggregation the oracle spells out (one shuffle, map-side
    partials, no second pass). Counts are exact; missing cells are 0
    via the count aggregate (never NULL), so the wide schema is
    dense and engine-portable."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("n_p"),
    ).orderBy("o_orderpriority")


# --- TPC-H Q17 shape: small-quantity-order revenue --------------------------


@_register(
    "q213_small_qty_revenue",
    """
    WITH slice_parts AS (
      SELECT p_partkey FROM part WHERE p_brand LIKE 'Brand#2%'
    ),
    avg_qty AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS aq
      FROM lineitem JOIN slice_parts ON l_partkey = p_partkey
      GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * a.aq
    """,
)
def q213_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems of a
    brand slice whose quantity is below half the part's average,
    their price total divided over 7 years. The correlated
    AVG-per-part subquery decorrelates to one aggregate joined back
    on partkey. Exactness: the per-part average is decimal-sum /
    exact-count (one division), the threshold one multiply — both
    engines produce the identical double, so the < filter selects
    the identical rows; the revenue sum rides DECIMAL. Scale: the
    part slice prunes BEFORE the lineitem aggregate (semi-join
    pushdown), both heavy operators shuffle on partkey so AQE can
    co-locate them, and the final result is a single row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    slice_parts = p.filter(F.col("p_brand").like("Brand#2%")).select(
        "p_partkey"
    )
    sliced = li.join(
        F.broadcast(slice_parts), li.l_partkey == F.col("p_partkey")
    )
    avg_qty = sliced.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("aq")
    )
    return (
        sliced.join(avg_qty.withColumnRenamed("l_partkey", "a_pk"),
                    F.col("l_partkey") == F.col("a_pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_small"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.lit(7.0)
            ).alias("avg_yearly"),
        )
    )
