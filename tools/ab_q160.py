"""Isolated A/B of the q160 unique-tiebreak sort (round-5 verdict
item 5: BENCH_r05 showed q160 warm 1.44 -> 2.25 s after the
s_suppkey tiebreak landed, but its warm time exceeded its cold time
in the same run, so noise was plausible — settle it the ab_q33 way).

Variant A is q160 exactly as registered (ORDER BY ... , s_suppkey —
the provably unique LIMIT-20 prefix). Variant B is the identical
plan with the pre-r5 non-unique sort (no s_suppkey key). Interleaved
round-robin against the noop sink so machine-load drift hits both
equally.

Usage: python tools/ab_q160.py [sf_dir=/root/testdata/sf0.1] [reps=7]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from pyspark.sql import functions as F

    from patientdataintegration_spark.session import build_session
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext3 import q160_min_cost_supplier

    spark = build_session("ab-q160")
    spark.sparkContext.setLogLevel("ERROR")

    def variant_a():
        return q160_min_cost_supplier(spark, sf_dir)

    def variant_b():
        # pre-r5 shape: same joins/aggregates, sort without the
        # unique suppkey tiebreak (rebuilt inline; not registered —
        # its LIMIT prefix is not deterministic, which is WHY r5
        # changed it)
        p = load_table(spark, sf_dir, "part")
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation")
        r = load_table(spark, sf_dir, "region")
        li = load_table(spark, sf_dir, "lineitem")
        eu_supp = (
            s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(
                F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        )
        offer = li.groupBy("l_partkey", "l_suppkey").agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
        )
        eu_offer = offer.join(
            F.broadcast(eu_supp), offer.l_suppkey == F.col("s_suppkey")
        )
        best = eu_offer.groupBy(F.col("l_partkey").alias("best_pk")).agg(
            F.min("cost").alias("best_cost")
        )
        slice_parts = p.filter(
            (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
        ).select("p_partkey")
        return (
            eu_offer.join(
                best,
                (F.col("l_partkey") == F.col("best_pk"))
                & (F.col("cost") == F.col("best_cost")),
            )
            .join(
                F.broadcast(slice_parts),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
            .limit(20)
            .select(
                "s_acctbal", "s_name", "n_name", "p_partkey",
                F.col("cost").alias("cost_min"),
            )
        )

    variants = {"with_suppkey_tiebreak": variant_a, "pre_r5_sort": variant_b}

    for q in variants.values():  # warm-up: codegen out of the timings
        q().write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(reps):
        for v, q in variants.items():
            t0 = time.time()
            q().write.format("noop").mode("overwrite").save()
            times[v].append(round(time.time() - t0, 3))

    out = {
        v: {
            "runs": ts,
            "median": round(statistics.median(ts), 3),
            "min": min(ts),
        }
        for v, ts in times.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
