"""Per-lane isolation probe for the r17 optimization round.

Usage:
    python tools/profile_lane.py q94_random_forest [q275_... ...] \
        [--reps 3] [--sf /root/testdata/sf0.1] [--explain plans/r17] \
        [--suffix _before]

Per lane: build the session once (bench.py's exact config via
build_session + warm-up), then run the lane `reps` times against the
noop sink (guide §1.4) with job descriptions set (guide §1.5), print
per-rep wall seconds, and optionally dump .explain("formatted") to
`<explain>/<lane><suffix>.txt`.

Also prints the driver-observed Spark job count per rep (statusTracker
delta) — the fixed-overhead signal for the micro-batch lanes: a lane
whose wall is 30 sequential 100 ms jobs is optimized by removing jobs,
not by making tasks faster.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lanes", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None,
                    help="directory to dump explain('formatted') files into")
    ap.add_argument("--suffix", default="",
                    help="filename suffix for the explain dump")
    args = ap.parse_args()

    from patientdataintegration_spark.session import build_session
    from patientdataintegration_spark.suite import QUERIES

    spark = build_session("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings"):
        spark.read.parquet(f"{args.sf}/{t}.parquet").count()

    tracker = spark.sparkContext.statusTracker()
    for lane in args.lanes:
        fn = QUERIES[lane]
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{lane} rep{rep}")
            jobs0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            df = fn(spark, args.sf)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            jobs1 = len(tracker.getJobIdsForGroup(None) or [])
            times.append(dt)
            print(f"{lane} rep{rep}: {dt:.3f}s (df-build {t_build:.3f}s, "
                  f"~{jobs1 - jobs0} jobs)", flush=True)
            if args.explain and rep == 0:
                os.makedirs(args.explain, exist_ok=True)
                path = os.path.join(args.explain,
                                    f"{lane}{args.suffix}.txt")
                with open(path, "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
        spark.sparkContext.setJobDescription(None)
        med = sorted(times)[len(times) // 2]
        print(f"== {lane}: median {med:.3f}s over {args.reps} reps "
              f"(min {min(times):.3f})", flush=True)


if __name__ == "__main__":
    main()
