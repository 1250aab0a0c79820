"""Plan-shape audit over the ENTIRE query registry — the scale-stance
twin of tools/oracle_check.py (which checks values): builds every
registered query's physical plan and reports the properties that
decide 100 TB behavior, flagging regressions.

Per query: shuffle-Exchange count, broadcast-join count,
cartesian/nested-loop join count, and whether any parquet scan reads
with neither pushed filters nor a pruned schema. Flags:

- `cartesian`: a CartesianProduct (always flagged) or a
  BroadcastNestedLoopJoin whose BROADCAST SIDE is not
  aggregate-derived — checked STRUCTURALLY on the plan tree: the
  BroadcastExchange child's subtree must contain an aggregate
  before any scan, which is exactly the sanctioned
  "crossJoin(broadcast(1-row aggregate frame))" pattern. A nested
  loop between two real relations flags even if the query ends in
  an aggregate elsewhere.
- `shuffle_heavy`: more shuffle boundaries than the allow-listed
  budget (default 12 — iterative/unrolled queries declare their own).

Also reported per query (informational, not flagged — many queries
legitimately scan without residual filters): scan count and how many
scans carry pushed filters.

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
    # pairs/signatures/sizes are separate keyed consumers of the one
    # shingle explode by design (sketch-vs-exact comparison needs
    # both paths); sigs are localCheckpoint-materialized, the rest
    # are single-key joins
    "q190_minhash_error": 24,
    # five chained stages + five per-stage accounting aggregations
    # joined on source — each stage is its standalone query's shape;
    # the composite's shuffle count is the SUM of the parts by design
    "q200_corpus_curation": 30,
    # composes the q98 IVF pipeline (budget 30) with the exhaustive
    # baseline and the overlap join
    "q203_ann_recall": 40,
    # the nightly-maintenance certificate: FIVE maintained artifacts
    # (monoid rollup, HLL state, bitmap state, join view, bloom
    # bitmap) EACH built twice (delta-merged + full-recompute twin)
    # plus two checksum reductions per comparison, in one lazy plan —
    # the composite's count is the sum of the parts by design (the
    # q200 rule); the DELTA path alone (what a real nightly runs
    # after decommissioning the twins) is the q114/q241/q243/q242/
    # q240 shapes, each within the default budget
    "q246_nightly_maintenance": 70,
    # the takedown certificate: FOUR maintained dedup artifacts (pair
    # view, labels, canonical docs, exact store) EACH built twice
    # (retraction-maintained + full-recompute twin) plus two checksum
    # reductions per comparison, in one lazy plan — the q246/q200
    # composite rule; the MAINTAINED path alone (what runs after the
    # twins certify) is broadcast anti/semi probes plus a star loop
    # over the dirty sliver, within the default budget
    "q274_takedown_certificate": 40,
    # the erasure-SLA certificate: SIX maintained artifacts, each
    # retraction-maintained once (no twins — q274/q246 already
    # certify maintained == recompute; this lane audits ABSENCE) plus
    # a rows + refs single-row aggregate pair per artifact — the
    # composite's count is the sum of the parts by design (the q200
    # rule); each artifact's maintained path alone is within the
    # default budget
    "q278_erasure_sla_certificate": 30,
    # maintained-store serving composites: the returned plan stitches
    # the generation read rule (base anti + per-generation upsert
    # joins + last-writer-wins filter, each a keyed stage on
    # delta-sized inputs) under the serve query itself (hot-term
    # rank + alignment/intersection joins + the output aggregate) —
    # the sum-of-parts rule (q200/q246); every stage past the one
    # streamed base scan is dirty-term- or query-sized
    "q286_phrase_from_store": 20,
    # the drift certificate: BOTH BM25 paths (store-served + corpus
    # recompute, each the q280 shape) plus the full-outer comparison
    # and the verdict aggregate in one lazy plan — the q274
    # certificate composite rule
    "q289_bm25_drift_certificate": 24,
}
DEFAULT_SHUFFLE_BUDGET = 12

# Nested-loop joins whose broadcast side is k-row BY CONSTRUCTION
# (a rank/row_number filter bounds it) — structurally indistinguishable
# from a real relation in the plan text, so allow-listed with the
# bounding argument:
NESTED_LOOP_ALLOW = {
    # centroid / probe-cell frames: rank-filtered to k rows before the
    # deliberate broadcast (operators/clustering.py, similarity.py)
    "q98_ivf_cosine_topk",
    "q132_kmeans_assign",
    "q157_semantic_dedup",
    # frozen 16-row centroid table (checkpointed at build) broadcast
    # under the three assignment scans — k-row by construction
    "q252_ivf_index_maintenance",
    # the EXHAUSTIVE ANN baseline and its recall audit: the broadcast
    # side is the query set, small BY CONTRACT (1% modulus filter;
    # cosine_topk's documented contract) — the nested loop IS the
    # operator here, the ground truth the bucketed paths (q93/q98)
    # are measured against
    "q202_bruteforce_topk",
    "q203_ann_recall",
    # q98's probe crossJoin against the SAME 16-row centroid table,
    # but read from the content-keyed cache (a 16-row parquet scan,
    # so the plan text can't show the aggregate that bounded it at
    # build time) — k-row by construction, the q252 argument
    "q276_retract_ivf",
    # the same 16-row frozen centroid table, read back from the
    # stream store's parquet (streaming/ivf.read_ivf_centroids) for
    # the q98 probe crossJoin — k-row by construction (n_cells=16
    # fixed at seed time; centroids never grow, the freeze contract)
    "q284_streaming_ivf",
}

# Streaming-execution lanes: the query function RUNS a stream when
# invoked (not a lazy plan) — skip in a plan audit.
SKIP = {
    "q88_stream_static_enrich",
    "q89_stream_dedup",
    "q90_stream_tumbling",
    "q96_stream_sessionize",
    "q99_stream_stream_join",
    "q180_stream_cdc_upsert",
    "q236_statestore_audit",
}


def _tree_depth(line: str) -> int:
    """Depth of a node line in Spark's simple-mode plan tree (tree
    art is 3-char units of ':- ', '+- ', ':  ', '   ')."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i // 3


def _unsanctioned_nested_loops(tree: str) -> list[str]:
    """Structural check over the simple-mode plan tree: every
    CartesianProduct flags; a BroadcastNestedLoopJoin is sanctioned
    ONLY if its BroadcastExchange child's subtree reaches an
    aggregate, a LocalTableScan (in-memory literal frame), or a
    Range before any file scan (i.e. the broadcast side is a tiny
    aggregate- or literal-derived frame — the
    crossJoin(broadcast(...)) patterns this suite uses for global
    scalars and parameter grids)."""
    lines = [ln for ln in tree.splitlines() if ln.strip()]
    out: list[str] = []
    for i, ln in enumerate(lines):
        if "CartesianProduct" in ln:
            out.append("CartesianProduct in plan")
            continue
        if "BroadcastNestedLoopJoin" not in ln:
            continue
        d = _tree_depth(ln)
        # walk the subtree, but only inspect exchanges that are
        # DIRECT children of this join (depth d+1): that is the
        # build side; deeper exchanges belong to the streamed
        # child's own joins and say nothing about this node
        j = i + 1
        sanctioned = False
        while j < len(lines) and _tree_depth(lines[j]) > d:
            if "BroadcastExchange" in lines[j] and _tree_depth(lines[j]) == d + 1:
                bd = _tree_depth(lines[j])
                k = j + 1
                while k < len(lines) and _tree_depth(lines[k]) > bd:
                    s = lines[k]
                    # aggregate-derived (1-row/`tiny frame) OR a
                    # constant literal frame (LocalTableScan of an
                    # in-memory list, Range of a small sequence) —
                    # both are the sanctioned broadcast-scalar shape
                    if (
                        "HashAggregate" in s
                        or "SortAggregate" in s
                        or "LocalTableScan" in s
                        or "Scan ExistingRDD" in s
                        or "Range (" in s
                    ):
                        sanctioned = True
                        break
                    if "Scan parquet" in s or "Join" in s:
                        break
                    k += 1
            if sanctioned:
                break
            j += 1
        if not sanctioned:
            out.append("BroadcastNestedLoopJoin with non-aggregate broadcast side")
    return out


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
            # recorded, not silently dropped — the registry-hygiene
            # contract test checks every query has a report entry
            report[name] = {
                "skipped": (
                    "streaming-execution lane (invoking it runs a stream, "
                    "not a lazy plan); shape covered by its batch twin "
                    "and pytest"
                )
            }
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = explain_str(df)
            shuffles = count_shuffles(df)
        except Exception as e:  # noqa: BLE001
            flags.append(f"{name}: plan build error: {e}")
            continue
        tree = explain_str(df, "simple")
        nested = tree.count("BroadcastNestedLoopJoin") + tree.count(
            "CartesianProduct"
        )
        bad_nested = _unsanctioned_nested_loops(tree)
        entry = {
            "shuffles": shuffles,
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "nested_or_cartesian": nested,
            "scans": plan.count("Scan parquet"),
            "scans_with_pushdown": len(
                [1 for m in plan.split("PushedFilters: [")[1:]
                 if m.split("]")[0].strip()]
            ),
        }
        report[name] = entry
        if name not in NESTED_LOOP_ALLOW:
            for why in bad_nested:
                flags.append(f"{name}: {why}")
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
