"""IVF ANN recall/cost sweep (round-5 verdict item 6: q203 measured
recall@3 = 0.60 at the registered n_cells=16 / n_probe=4 default —
either ship a default that clears a stated target or document the
curve).

For each (n_cells, n_probe) combo: mean recall@3 of
`ivf_cosine_topk` vs the exhaustive `cosine_topk` ground truth over
the same query set q98/q202/q203 use (vec_id % 100 == 0), plus the
warm wall time of the IVF query and the fraction of the corpus the
probe set scans (the honest cost proxy — at fixed n_cells, recall
and scanned fraction BOTH grow with n_probe).

Round-7 addition (r6 verdict item 5): a CLUSTERED corpus mode. The
r6 sweep proved the driver's isotropic synthetic embeddings give IVF
nothing to exploit — nearest neighbors are spread uniformly over
cells, so recall ~= scan fraction, which is an artifact of the test
data, not of IVF. `--corpus clustered` derives a mixture-of-32
corpus deterministically from the same table (cluster id = vec_id %
32; centers are md5-derived uniforms per (cluster, dim); the
original vector, scaled down, becomes the within-cluster noise) —
the geometry real embedding corpora have, where a query's true
neighbors share its cluster and IVF's probe set captures them at a
small scan fraction.

Usage: python tools/ivf_recall_sweep.py [sf_dir=/root/testdata/sf0.1] [reps=3] [corpus=isotropic|clustered]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMBOS = [
    (16, 2),
    (16, 4),
    (16, 6),
    (16, 8),
    (64, 4),
    (64, 8),
    (64, 16),
]


N_TRUE_CLUSTERS = 32
_NOISE_SCALE = 0.3
_CENTER_HALF_RANGE = 0.25


def _clustered_corpus(e):
    """Mixture-of-Gaussians-shaped corpus derived deterministically
    from the isotropic embeddings table: vec' = center(vec_id % 32)
    + 0.3 * vec. Centers are md5-derived uniforms in [-0.25, 0.25]
    per (cluster, dim) — center norms ~1.1 vs noise norms ~0.3, so
    within-cluster cosines are high and cross-cluster cosines are
    ~0: the separable geometry IVF exists for."""
    from pyspark.sql import functions as F

    cl = (F.col("vec_id") % N_TRUE_CLUSTERS).cast("int").cast("string")
    dims = F.sequence(F.lit(1), F.size("embedding"))
    centers = F.transform(
        dims,
        lambda j: (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", F.lit("ivfc"), cl, j.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(2**32))
            - 0.5
        )
        * F.lit(2.0 * _CENTER_HALF_RANGE),
    )
    mixed = F.zip_with(
        centers,
        F.col("embedding"),
        lambda c, x: c + x.cast("double") * F.lit(_NOISE_SCALE),
    )
    return e.select("vec_id", mixed.alias("embedding"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    corpus = sys.argv[3] if len(sys.argv) > 3 else "isotropic"

    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
    )
    from patientdataintegration_spark.session import build_session
    from patientdataintegration_spark.sources.catalog import load_table

    spark = build_session("ivf-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    e = load_table(spark, sf_dir, "embeddings")
    if corpus == "clustered":
        e = _clustered_corpus(e)
    elif corpus != "isotropic":
        raise SystemExit(f"unknown corpus {corpus!r}")
    e = e.localCheckpoint()
    q = e.filter(F.col("vec_id") % 100 == 0)
    n_queries = q.count()
    exact = (
        cosine_topk(q, e, k=3)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )

    results = []
    for n_cells, n_probe in COMBOS:
        def ivf():
            return ivf_cosine_topk(
                q, e, k=3, n_cells=n_cells, n_probe=n_probe,
                seed=42, quantizer="exact",
            )

        approx = ivf().select(
            F.col("query_id").alias("i_q"), F.col("neighbor_id").alias("i_n")
        )
        overlap = exact.join(
            approx,
            (F.col("query_id") == F.col("i_q"))
            & (F.col("neighbor_id") == F.col("i_n")),
        ).count()
        recall = overlap / (3.0 * n_queries)

        ivf().write.format("noop").mode("overwrite").save()  # warm-up
        ts = []
        for _ in range(reps):
            t0 = time.time()
            ivf().write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        results.append(
            {
                "n_cells": n_cells,
                "n_probe": n_probe,
                "scan_fraction_approx": round(n_probe / n_cells, 3),
                "recall_at_3": round(recall, 4),
                "warm_median_s": round(statistics.median(ts), 3),
            }
        )
        print(json.dumps(results[-1]))

    print(json.dumps({"sf_dir": sf_dir, "n_queries": n_queries, "sweep": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
