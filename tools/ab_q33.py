"""Isolated A/B/C of the q33 n-gram Jaccard stop-shingle cap
strategies (round-4 verdict item 4: reconcile the BENCH_HISTORY warm
level shift with PERF_NOTES' claim).

Runs each `cap_strategy` of `dedup.ngram_jaccard_pairs` N times
against the noop sink at the bench SF, same session, interleaved
round-robin so machine-load drift hits all variants equally; prints
per-variant times + median, and cross-checks that all variants return
identical rows first (exceptAll both ways at the A/B scale).

Usage: python tools/ab_q33.py [sf_dir=/root/testdata/sf0.1] [reps=5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRATEGIES = ["post_agg", "semi_join", "broadcast_hot"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from patientdataintegration_spark.session import build_session
    from patientdataintegration_spark.sources.catalog import load_table

    spark = build_session("ab-q33")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, sf_dir, "documents")

    def q(strategy: str):
        return ngram_jaccard_pairs(
            d,
            block_col="source",
            max_docs_per_shingle=256,
            cap_strategy=strategy,
        )

    # equivalence first — a fast A/B of wrong answers is worthless
    base = q(STRATEGIES[0])
    for s in STRATEGIES[1:]:
        other = q(s)
        ab = base.exceptAll(other).count()
        ba = other.exceptAll(base).count()
        assert ab == 0 and ba == 0, f"{s} diverges: {ab}/{ba} rows"
    print(f"equivalence: all {len(STRATEGIES)} strategies identical")

    # warm-up each plan once (codegen compile out of the timings)
    for s in STRATEGIES:
        q(s).write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {s: [] for s in STRATEGIES}
    for _ in range(reps):
        for s in STRATEGIES:
            t0 = time.time()
            q(s).write.format("noop").mode("overwrite").save()
            times[s].append(round(time.time() - t0, 3))

    out = {
        s: {
            "runs": ts,
            "median": round(statistics.median(ts), 3),
            "min": min(ts),
        }
        for s, ts in times.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
