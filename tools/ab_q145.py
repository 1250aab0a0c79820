"""Isolated A/B of q145_equidepth_histogram (round-7 verdict item 2:
warm 1.09 s r6 -> 2.57 s r7, +135% — the only r7-changed query in
the bench set; decide how much is the global_row_number rewrite vs
the environmental shift that moved unchanged queries 15-52% the same
round).

Variants, interleaved round-robin so machine-load drift hits all
equally:

- adaptive          — q145 as registered in r8: global_row_number
                      with num_partitions=None (Catalyst-size-based,
                      a handful of range partitions at sf0.1)
- fixed32           — the r7 spelling: num_partitions=32 (the
                      shuffle-partition conf fallback the r7 caller
                      never tuned)
- window_single_red — the pre-r7 spelling: one unpartitioned
                      ntile() window (the single-reducer plan the
                      rewrite removed; correct here, a non-starter
                      at 100 TB — kept as the reference point)

Usage: python tools/ab_q145.py [sf_dir=/root/testdata/sf0.1] [reps=9]
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 9

    from pyspark.sql import Window, functions as F

    from patientdataintegration_spark.operators.ranking import (
        global_row_number,
        ntile_from_rank,
    )
    from patientdataintegration_spark.session import build_session
    from patientdataintegration_spark.sources.catalog import load_table

    spark = build_session("ab-q145")
    spark.sparkContext.setLogLevel("ERROR")

    def base():
        return load_table(spark, sf_dir, "lineitem").select(
            F.col("l_extendedprice").cast("double").alias("x"),
            "l_orderkey",
            "l_linenumber",
        )

    order = [
        F.col("x").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ]

    def rollup(binned):
        return binned.groupBy(F.col("bin").cast("bigint").alias("bin")).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("x"), 2).alias("bin_min"),
            F.round(F.max("x"), 2).alias("bin_max"),
        )

    def ranked(num_partitions):
        r = global_row_number(
            base(),
            order,
            rn_col="rn",
            total_col="n_total",
            num_partitions=num_partitions,
        ).select(
            "x", ntile_from_rank(F.col("rn"), F.col("n_total"), 8).alias("bin")
        )
        return rollup(r)

    def window_single_reducer():
        w = Window.orderBy(*order)
        r = base().select("x", F.ntile(8).over(w).alias("bin"))
        return rollup(r)

    variants = {
        "adaptive": lambda: ranked(None),
        "fixed32": lambda: ranked(32),
        "window_single_red": window_single_reducer,
    }

    for q in variants.values():  # warm-up: codegen out of the timings
        q().write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(reps):
        for v, q in variants.items():
            t0 = time.perf_counter()
            q().write.format("noop").mode("overwrite").save()
            times[v].append(round(time.perf_counter() - t0, 3))

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
