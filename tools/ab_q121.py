"""Isolated A/B of q121_resample_interp (round-6 verdict item 3:
warm 2.35 s r5 -> 3.73 s r6 with no code change since r3, and a
2.17-5.6 s band across 36 BENCH_HISTORY observations — settle
whether that is environment or plan instability, the ab_q33/ab_q160
round-robin way).

Variant A is q121 exactly as registered. Variant B localCheckpoints
the deduplicated observation relation, which otherwise has two plan
consumers (bounds->grid and the tagged union) and re-executes its
events scan + dedup shuffle — the q130/q138/q208 multi-consumer
class. Interleaved round-robin against the noop sink so machine-load
drift hits both equally.

Usage: python tools/ab_q121.py [sf_dir=/root/testdata/sf0.1] [reps=9]
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

    from patientdataintegration_spark.operators.temporal import resample_linear
    from patientdataintegration_spark.session import build_session
    from patientdataintegration_spark.sources.catalog import load_table

    spark = build_session("ab-q121")
    spark.sparkContext.setLogLevel("ERROR")

    def variant_a():
        return resample_linear(load_table(spark, sf_dir, "events"))

    def variant_b():
        return resample_linear(
            load_table(spark, sf_dir, "events"), checkpoint_obs=True
        )

    variants = {"registered_two_consumer": variant_a, "checkpointed_obs": variant_b}

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
