"""Deterministic k-means over embedding columns (north-star
extension — the semantic-clustering stage of a training-data
pipeline: cluster-then-canonicalize semantic dedup, IVF cell
training for ANN, curriculum bucketing).

`pyspark.ml.clustering.KMeans` exists but is neither deterministic
across partitionings (k-means|| init, RNG) nor oracle-checkable;
this implementation is both, which is what the correctness gate
needs, and it demonstrates the iterative-dataflow shape explicitly:

- seeds: the k lowest-id vectors (deterministic, SQL-expressible);
- assign: every vector against all k centroids — the centroid frame
  is k rows, ALWAYS broadcast, so assignment is a map-side cross
  product with an argmin window per vector, no shuffle of the
  embedding table beyond the per-vector window;
- update: per-dimension means with the sums routed through
  DECIMAL(38,15) — order-independent and engine-exact, so centroid
  coordinates (and therefore every subsequent distance) are
  bit-identical across engines and partitionings;
- distances: sequential left-fold squared-L2 (zip_with + aggregate),
  matching DuckDB's list_reduce fold order exactly.

K iterations = K (assign + update) rounds + one final assignment,
all as one lazy DAG — no driver-side .collect() loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _sq_dist(a, b):
    diffs = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _assign(emb: DataFrame, centroids: DataFrame, id_col: str) -> DataFrame:
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        "v",
        "c",
        _sq_dist(F.col("v"), F.col("cv")).alias("dist"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("dist").asc(), F.col("c").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _emb_frame(
    df: DataFrame, id_col: str, vec_col: str, checkpoint_dir: str | None
) -> DataFrame:
    """(id, double-vector) projection, optionally parquet-materialized
    so iterative consumers re-scan instead of re-executing upstream."""
    emb = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if checkpoint_dir is not None:
        emb.write.mode("overwrite").parquet(checkpoint_dir)
        emb = df.sparkSession.read.parquet(checkpoint_dir)
    return emb


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run `iterations` rounds of deterministic Lloyd's k-means and
    return the FINAL CENTROIDS (c, cv) — the reusable quantizer
    frame (IVF coarse quantizers, curriculum buckets) behind
    `kmeans_assign`. Seeds are the k lowest-id vectors; ties and
    means are deterministic as documented on `kmeans_assign`.

    ``checkpoint_dir``: when set, the (id, vector) projection is
    materialized to parquet there ONCE and every (assign + update)
    round re-scans that parquet instead of re-executing the upstream
    plan — the 100-TB path when the embedding producer is expensive.
    Parquet severs the lineage without the `.persist()` trap
    (persist blocks AQE runtime stats; see graph.pagerank)."""
    emb = _emb_frame(df, id_col, vec_col, checkpoint_dir)
    return _centroids_from_emb(emb, k, iterations, id_col)


def _centroids_from_emb(
    emb: DataFrame, k: int, iterations: int, id_col: str
) -> DataFrame:
    # Deliberately NOT persisted although it is consumed once per
    # assignment round: measured SLOWER with persist at sf0.1 — the
    # cache boundary hides runtime stats from AQE on every downstream
    # join, which costs more than re-running the cheap scan+cast.
    w_seed = Window.orderBy(id_col)
    centroids = (
        emb.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(w_seed) - 1).cast("bigint").alias("c"),
            F.col("v").alias("cv"),
        )
    )
    for _ in range(iterations):
        assigned = _assign(emb, centroids, id_col)
        dims = assigned.select(
            "c", F.posexplode("v").alias("dim", "val")
        )
        means = dims.groupBy("c", "dim").agg(
            (
                F.sum(F.col("val").cast("decimal(38,15)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("m")
        )
        centroids = means.groupBy("c").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("cv")
        )
    return centroids


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run `iterations` rounds of deterministic Lloyd's k-means and
    return the final assignment (id, cluster, squared distance).

    Ties in the argmin break on the cluster index; empty clusters
    simply stop receiving updates (their centroid row disappears —
    acceptable for the deterministic-analytics use; a trainer would
    re-seed them). See `kmeans_centroids` for the quantizer frame
    and the ``checkpoint_dir`` scale path — the final assignment
    reads the SAME (possibly checkpointed) frame as the iterations,
    so with checkpoint_dir set the upstream producer executes once
    total."""
    emb = _emb_frame(df, id_col, vec_col, checkpoint_dir)
    centroids = _centroids_from_emb(emb, k, iterations, id_col)
    final = _assign(emb, centroids, id_col)
    return final.select(
        id_col,
        F.col("c").alias("cluster"),
        F.round(F.col("dist"), round_digits).alias("sq_dist"),
    )
