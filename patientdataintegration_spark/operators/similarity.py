"""Similarity search over embedding columns (north-star extension,
BASELINE.json; SURVEY.md §7 phase 6).

Two paths, as a large-scale pipeline needs both:

- **Brute-force cosine top-k** (`cosine_topk`): exact baseline.
  The dot product is a higher-order `zip_with`+`aggregate` (JVM
  expression — no Python). Cost is |Q|×|C| — correct whenever the
  query side is small/broadcastable; at 100 TB this is the re-rank
  stage, not the first stage.
- **LSH-bucketed cosine** (`lsh_cosine_topk`): random-hyperplane
  signatures; candidates must share a signature bucket, cutting the
  join from |Q|×|C| to per-bucket products. Planes are generated
  driver-side from a seed (deterministic) and applied as literal
  arrays — the signature is a native expression, no UDF. This is
  the scale path (an IVF variant would replace the hyperplanes with
  k-means centroids from `pyspark.ml`).

Float arrays are cast element-wise to double BEFORE any arithmetic:
sequential left-fold accumulation then matches any engine that
reduces sequentially (DuckDB `list_reduce`), keeping the oracle
check exact up to the final rounding.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two numeric arrays."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def sq_norm(a: Column) -> Column:
    prods = F.transform(_as_double(a), lambda x: x * x)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (it is small by contract); the
    candidate scan streams once. Rounding before ranking makes the
    ranking stable across engines; ties break on neighbor id.

    Norms are computed ONCE per vector before the join — inside the
    pair projection they would be re-evaluated per pair (higher-order
    functions run interpreted, no CSE), tripling the dominant cost.
    The expression value is identical, so rounding is unaffected.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("q_norm"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("c_norm"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                round_digits,
            )
            + F.lit(0.0)  # normalize IEEE -0.0 (the q141 lesson)
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def neardup_pairs(
    df: DataFrame,
    block_col: str = "label",
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) within the
    same block whose cosine similarity clears `threshold`.

    The self-join is equi-keyed on the blocking column, so the
    shuffle co-locates each block and the quadratic compare stays
    per-block (the block is the unit of skew — at corpus scale the
    block key is an LSH bucket or cluster id, exactly like
    `lsh_cosine_topk`'s signature). Dedup via id ordering, not
    `distinct()`."""
    a = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("na"),
    )
    b = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("nb"),
    )
    pairs = a.join(b, "block").filter(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "block",
            "vec_a",
            "vec_b",
            (
                F.round(
                    dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                    round_digits,
                )
                + F.lit(0.0)  # normalize IEEE -0.0 (the q141 lesson)
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side seed, tiny)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def rh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(vec · plane_i),
    packed into a bigint. Native expressions only."""
    sig = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot(vec, plane) > 0).cast("bigint") * F.lit(2**i)
        sig = bit if sig is None else sig + bit
    return sig


def lsh_cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates must share the hyperplane bucket
    with the query. Join key is the bigint signature — the shuffle
    moves (id, signature) pairs, not vectors; vectors are re-read
    only for the per-bucket exact re-rank."""
    planes = hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("q_norm"),
        rh_signature(F.col(vec_col), planes).alias("sig"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("c_norm"),
        rh_signature(F.col(vec_col), planes).alias("sig"),
    )
    pairs = c.join(F.broadcast(q), on="sig").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                4,
            )
            + F.lit(0.0)  # normalize IEEE -0.0 (the q141 lesson)
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_index_exact(
    candidates: DataFrame,
    n_cells: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index as a first-class PAIR of relations —
    (assigned, centroids) — with the deterministic Lloyd's coarse
    quantizer (`clustering.kmeans_centroids`): `assigned` is the
    cell-keyed inverted file (neighbor_id, c_vec, c_norm, cell),
    `centroids` the tiny (cell, centroid) table every probe
    broadcasts. Splitting index from search (vs the fused
    `ivf_cosine_topk`) is what gives the index a MAINTENANCE
    surface: q252 appends delta assignments against the frozen
    centroids; `retract_ivf` removes vectors (q276); `ivf_search`
    serves queries against whatever the maintained relation
    currently holds."""
    from patientdataintegration_spark.operators.clustering import (
        kmeans_centroids,
    )

    cent = kmeans_centroids(
        candidates,
        k=n_cells,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
    )
    centroids = cent.select(
        F.col("c").alias("cell"), F.col("cv").alias("centroid")
    )
    return ivf_assign(candidates, centroids, id_col, vec_col), centroids


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign vectors to an EXISTING frozen (cell, centroid) table —
    the INSERT verb of the maintained IVF index (q252's
    frozen-centroid append; the per-batch map job of the IVF stream,
    `streaming/ivf.py`): the centroid table broadcasts, assignment is
    a pure per-row argmin, and the output rows are inverted-file rows
    (`ivf_index_exact`'s `assigned` shape) ready to append — which is
    why maintained == rebuilt is bit-identical (the q252/q276
    certificates). FAISS analogue: IndexIVF.add."""
    from patientdataintegration_spark.operators.clustering import _assign

    cent = centroids.select(
        F.col("cell").alias("c"), F.col("centroid").alias("cv")
    )
    emb = vectors.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    return _assign(emb, cent, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("c_vec"),
        F.sqrt(sq_norm(F.col("v"))).alias("c_norm"),
        F.col("c").alias("cell"),
    )


def ivf_search(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe + exact-rerank against a prebuilt (assigned, centroids)
    IVF index: each query ranks the broadcast centroid table, keeps
    its `n_probe` nearest cells, and reranks only those cells'
    vectors. The index relation is read as-is — maintained inserts
    (q252) and retractions (`retract_ivf`, q276) are served with no
    rebuild, exactly the FAISS add/remove_ids contract."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("q_norm"),
    )
    # rank this query's cells by centroid distance, keep n_probe
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("_cdist").asc(), F.col("cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn(
            "_cdist",
            sq_norm(F.zip_with(_as_double(F.col("q_vec")), F.col("centroid"), lambda x, y: x - y)),
        )
        .withColumn("_pr", F.row_number().over(probe_w))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "q_vec", "q_norm", "cell")
    )
    pairs = assigned.join(F.broadcast(probes), on="cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                4,
            )
            + F.lit(0.0)  # normalize IEEE -0.0 (the q141 lesson)
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def retract_ivf(
    assigned: DataFrame,
    deleted_ids: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF index maintenance under VECTOR DELETES — the erasure verb
    the r12 verdict named first (a pipeline that honors document
    takedowns but leaves the vectors discoverable through the ANN
    index has not actually erased them): one broadcast anti-join on
    the inverted file's id. The repair contract, stated like
    q268/q272's:

    - centroids stay FROZEN (the q252 production pattern) — a delete
      never moves cell boundaries, so NO cell is rebuilt and no
      surviving row is touched;
    - an emptied cell REMAINS in the centroid table: probes still
      rank it, scan zero rows there, and lose nothing;
    - therefore search-after-retract is BIT-IDENTICAL to a rebuild
      over the survivors against the same frozen centroids
      (assignment is a pure per-row function) — pinned in
      tests/test_dedup_similarity.py, hash-proven by q276's oracle,
      which recomputes the probe+rerank over the surviving corpus.

    At 100 TB: the takedown set broadcasts; the inverted file (the
    corpus-sized side, cell-partitioned on disk) streams once and is
    never shuffled — the q272 retraction shape on the ANN store.
    FAISS analogue: IndexIVF.remove_ids."""
    dele = F.broadcast(
        deleted_ids.select(
            F.col(id_col).cast(dict(assigned.dtypes)["neighbor_id"]).alias(
                "neighbor_id"
            )
        ).distinct()
    )
    return assigned.join(dele, "neighbor_id", "left_anti").select(
        *assigned.columns
    )


def ivf_cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "ml",
    quantizer_iterations: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer
    partitions candidates into cells; each query probes its `n_probe`
    nearest cells and exact-reranks only those candidates.

    The alternative scale path to `lsh_cosine_topk` (FAISS-style IVF
    vs random hyperplanes): cell assignment is a plan-native
    transform, and the probe set per query comes from a broadcast of
    the tiny centroid table. Shuffle key is the cell id; candidate
    vectors are read once. Recall grows with n_probe — pytest pins
    it against the brute-force baseline.

    ``quantizer``: 'ml' fits `pyspark.ml` KMeans (k-means||, fast,
    engine-specific); 'exact' uses the DETERMINISTIC Lloyd's kmeans
    (`clustering.kmeans_centroids` — decimal-exact means, lowest-id
    seeds), which makes the WHOLE query bit-reproducible across
    engines and partitionings, so a SQL oracle can check it
    end-to-end (q98)."""
    if quantizer == "exact":
        assigned, centroids = ivf_index_exact(
            candidates,
            n_cells=n_cells,
            iterations=quantizer_iterations,
            id_col=id_col,
            vec_col=vec_col,
        )
    elif quantizer == "ml":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.feature import VectorAssembler  # noqa: F401 (doc pointer)
        from pyspark.ml.functions import array_to_vector, vector_to_array

        cand_vec = candidates.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            array_to_vector(_as_double(F.col(vec_col))).alias("features"),
        )
        km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
        model = km.fit(cand_vec)
        assigned = model.transform(cand_vec).select(
            "neighbor_id",
            "c_vec",
            F.sqrt(sq_norm(F.col("c_vec"))).alias("c_norm"),
            "cell",
        )

        centers = [
            (int(i), [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ]
        spark = queries.sparkSession
        centroids = spark.createDataFrame(
            centers, "cell int, centroid array<double>"
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r} (use 'ml' or 'exact')")
    return ivf_search(
        queries,
        assigned,
        centroids,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
    )


def quantize_embeddings(
    df: DataFrame,
    levels_pow2: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 9,
) -> DataFrame:
    """Scalar quantization of an embedding column to a power-of-two
    lattice — the storage-compression step of a 100 TB vector
    pipeline (int8-style codes at a fraction of the float32 bytes;
    ANN pre-filters on codes, exact re-rank on floats).

    `code = floor(x * levels)` per element. With a power-of-two
    `levels`, x*levels, floor, and code/levels are all IEEE-exact, so
    codes and reconstruction error are bit-identical across engines
    and partitionings — no rounding leniency needed anywhere except
    the final squared-error sum. Zero shuffle, one scan."""
    if levels_pow2 & (levels_pow2 - 1):
        raise ValueError("levels_pow2 must be a power of two")
    lv = F.lit(float(levels_pow2))
    codes = F.transform(
        _as_double(F.col(vec_col)), lambda x: F.floor(x * lv).cast("bigint")
    )
    err_terms = F.zip_with(
        _as_double(F.col(vec_col)),
        codes,
        lambda x, c: (x - c.cast("double") / lv) * (x - c.cast("double") / lv),
    )
    return df.select(
        F.col(id_col),
        codes.alias("codes"),
        F.aggregate(codes, F.lit(0).cast("bigint"), lambda a, c: a + c).alias("code_sum"),
        F.round(
            F.aggregate(err_terms, F.lit(0.0), lambda a, e: a + e), round_digits
        ).alias("recon_err"),
    )


def srp_banded_neardup_pairs(
    df: DataFrame,
    signs: list[list[int]],
    n_bands: int = 2,
    min_cosine: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: signed random
    projections (the dense-vector SimHash) banded LSH-style, then an
    exact cosine check on the candidates only — never all pairs.

    `signs` is a k x dim +/-1 hyperplane matrix (deterministically
    derived by the caller so a SQL oracle can replay it). The k sign
    bits split into `n_bands` bands of k/n_bands bits; two vectors
    are CANDIDATES iff they agree on every bit of at least one band
    (one equi-join per band on the band key, unioned and
    deduplicated — the minhash-LSH join shape). With b bands of r
    bits, a pair at angle theta collides with prob
    1-(1-(1-theta/pi)^r)^b: at the default 2x8 over 16 planes,
    ~0.99 for cosine 0.999 (true near-dups) vs ~0.008 for cosine 0
    (background) — the candidate set is ~1% of the quadratic pair
    space, and band keys are balanced because the bits are
    independent, so no hot buckets. Candidates then get the exact
    sequential-fold cosine (bit-identical cross-engine, the q36/q192
    discipline) rounded at 4, kept at >= min_cosine.

    Scale: two shuffles per band (self-join on an 8-bit-key... the
    key space grows with r, widen r for bigger corpora), vectors
    re-joined by id only for surviving candidates. The banding can
    MISS a true near-dup with prob ~1% at the defaults —
    deterministically (no RNG), so results are still reproducible
    and oracle-checkable; raise n_bands for recall, raise r for
    precision/balance."""
    k = len(signs)
    if k % n_bands:
        raise ValueError(f"n_bands={n_bands} must divide k={k}")
    r = k // n_bands

    vecs = df.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v"))
    proj_cols = []
    for j in range(k):
        sgn = F.array(*[F.lit(float(s)) for s in signs[j]])
        p = F.aggregate(
            F.zip_with(F.col("v"), sgn, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj_cols.append((p >= 0).cast("int").alias(f"bit{j}"))
    bits = vecs.select("vid", "v", *proj_cols)
    band_cols = []
    for b in range(n_bands):
        key = None
        for i in range(r):
            term = F.col(f"bit{b * r + i}") * F.lit(1 << i)
            key = term if key is None else key + term
        band_cols.append(key.alias(f"band{b}"))
    # The band-key relation has 2*n_bands plan consumers (both sides
    # of every band self-join); without truncation each one re-runs
    # the k-projection scan (DataFrame DAG branches re-execute their
    # upstream — no cross-branch CSE). It is tiny (id + n_bands
    # small ints — the vectors are NOT carried), so localCheckpoint
    # it once; the same discipline as connected_components' edges.
    banded = bits.select("vid", *band_cols).localCheckpoint()

    cand = None
    for b in range(n_bands):
        a, c = banded.alias("a"), banded.alias("c")
        pairs_b = a.join(
            c,
            (F.col(f"a.band{b}") == F.col(f"c.band{b}"))
            & (F.col("a.vid") < F.col("c.vid")),
        ).select(
            F.col("a.vid").alias("vec_a"), F.col("c.vid").alias("vec_b")
        )
        cand = pairs_b if cand is None else cand.union(pairs_b)
    cand = cand.distinct()

    va = vecs.select(F.col("vid").alias("vec_a"), F.col("v").alias("v_a"))
    vb = vecs.select(F.col("vid").alias("vec_b"), F.col("v").alias("v_b"))
    scored = (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (
                F.round(
                    dot(F.col("v_a"), F.col("v_b"))
                    / (F.sqrt(sq_norm(F.col("v_a"))) * F.sqrt(sq_norm(F.col("v_b")))),
                    4,
                )
                + F.lit(0.0)
            ).alias("cos_sim"),
        )
    )
    return scored.filter(F.col("cos_sim") >= F.lit(min_cosine))
