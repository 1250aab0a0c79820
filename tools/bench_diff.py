"""Per-query bench regression report from BENCH_HISTORY.jsonl.

Compares the LAST entry against the MEDIAN prior run per query
(robust both to machine-load noise — the r3 lesson: a loaded box
shows uniform +30-50% that looks like a regression — and to the
min-of-N bias that flags every noisy sub-second query once history
grows). The best prior is shown alongside for context. Prints
queries above the threshold ratio.

Baseline-reset markers (r11 verdict item 4): a deliberate
reimplementation changes a lane's cost-by-construction, after which
history rows from the RETIRED spelling are not a regression baseline
— they made q145 re-flag its r7 single-reducer→distributed trade
every round, needing hand-adjudication each time. A history line

    {"baseline_reset": ["q145_equidepth_histogram"], "reason": "..."}

invalidates all PRIOR samples for the listed lanes (position in the
file is the cutoff, so the marker is append-order metadata like the
round markers, and survives future appends untouched).

Usage: python tools/bench_diff.py [threshold=1.25]
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 1.25
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_HISTORY.jsonl")
    entries = []
    resets: dict[str, int] = {}  # lane -> first valid entry index
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("baseline_reset"):
                for lane in d["baseline_reset"]:
                    resets[lane] = len(entries)
            if d.get("queries"):
                d["_idx"] = len(entries)
                entries.append(d)
    if len(entries) < 2:
        print("need at least two bench entries with per-query timings")
        return 0
    last = entries[-1]
    # compare like with like: only prior entries at the SAME scale
    # factor (history may mix sf0.01 iteration runs with sf0.1)
    prior = [e for e in entries[:-1] if e.get("sf") == last.get("sf")]
    if not prior:
        print(f"no prior entries at sf={last.get('sf')}; nothing to compare")
        return 0
    # prefer IDLE-probe priors for the baseline (r8 verdict stretch):
    # entries stamped by bench.py with the pre-run loadavg; a loaded
    # box shifts every query uniformly +20-50%, so keeping those runs
    # in the median inflates the baseline and masks real regressions.
    # Entries without the stamp (pre-r9 history) stay eligible.
    def _idle(e):
        l1 = e.get("load1_start")
        cpus = e.get("cpus") or 32
        if l1 is not None and l1 >= cpus / 4:
            return False
        # hypervisor steal over the run window — the noise loadavg
        # cannot see (co-tenant bursts inflate every query uniformly
        # while in-guest load reads idle)
        steal = e.get("steal_pct")
        if steal is not None and steal >= 3.0:
            return False
        return True
    idle_prior = [e for e in prior if _idle(e)]
    if len(idle_prior) >= 2:
        prior = idle_prior
    if not _idle(last):
        print(f"NOTE: last entry ran on a LOADED machine "
              f"(load1_start={last.get('load1_start')}, "
              f"steal_pct={last.get('steal_pct')}, cpus={last.get('cpus')}) — "
              f"expect a uniform shift across all queries; trust idle-probe "
              f"entries over this one")
    import statistics

    samples: dict[str, list[float]] = {}
    for e in prior:
        for q, v in e["queries"].items():
            if e["_idx"] < resets.get(q, 0):
                continue  # retired-spelling row: not a valid baseline
            samples.setdefault(q, []).append(v)
    if resets:
        skipped = sorted(
            q for q in (last.get("queries") or {}) if q in resets
        )
        if skipped:
            print(f"baseline resets active for: {', '.join(skipped)} "
                  f"(pre-reset history rows excluded from their medians)")
    ratios: dict[str, tuple[float, float, float, float]] = {}
    for q, v in sorted(last["queries"].items()):
        s = samples.get(q)
        if not s:
            continue
        med = statistics.median(s)
        if med:
            ratios[q] = (med, min(s), v, v / med)
    # SUITE-WIDE shift normalization (r9 verdict item 7): machine
    # conditions — hypervisor co-tenants trashing cache/memory
    # bandwidth (invisible even to the steal counter), frequency
    # scaling — shift EVERY query by a common factor; a code change
    # shifts the queries it touched RELATIVE to the rest. So the
    # regression signal is the per-query ratio normalized by the
    # suite-wide median ratio: flag only queries slower than
    # threshold BOTH absolutely and after dividing out the global
    # shift. The global factor itself is printed so a drifting box
    # is visible rather than silently absorbed.
    g = statistics.median(r for (_, _, _, r) in ratios.values()) if ratios else 1.0
    flagged = [
        (q, med, best, v, r)
        for q, (med, best, v, r) in sorted(ratios.items())
        if r >= threshold and r / max(g, 1.0) >= threshold
    ]
    # r10 ADVICE: the tool cannot DISTINGUISH a uniform environmental
    # shift from a code change that slows the whole suite (a shared
    # helper regression shifts every query too). So a suite-wide
    # factor at/above the threshold is itself a flag — labeled as
    # cause-unknown and exiting nonzero — rather than being declared
    # environmental and normalized into silence.
    suite_wide_flag = g >= threshold
    shift_label = ""
    if suite_wide_flag:
        shift_label = (" (SUITE-WIDE SHIFT AT/ABOVE THRESHOLD: uniform"
                       " across queries, cause UNKNOWN to this tool —"
                       " could be environment OR a shared-code"
                       " regression; adjudicate with an isolated A/B)")
    elif g >= 1.15:
        shift_label = (" (uniform shift below threshold — consistent"
                       " with environment; normalized out of per-query"
                       " flags)")
    # uniformity triple (the r15/r16 adjudication ritual, built in):
    # a tight p10..p90 band around the median says "everything moved
    # together" (environment); a long right tail concentrated in the
    # lanes a round touched says "code". Printed so the adjudication
    # evidence is in the log instead of recomputed by hand each round.
    rs = sorted(r for (_, _, _, r) in ratios.values())
    p10 = rs[len(rs) // 10] if rs else 1.0
    p90 = rs[9 * len(rs) // 10] if rs else 1.0
    print(f"last total={last['value']}s warm={last.get('value_warm')}s "
          f"({len(last['queries'])} queries); threshold={threshold}x vs median prior; "
          f"suite-wide shift factor={g:.2f}x over {len(ratios)} common queries "
          f"[uniformity p10={p10:.2f} p50={g:.2f} p90={p90:.2f}]"
          + shift_label)
    if not flagged:
        if suite_wide_flag:
            print("no per-query regressions above threshold after shift "
                  "normalization, but the suite-wide factor itself exceeds "
                  "the threshold — investigate before trusting this run")
            return 1
        print("no per-query regressions above threshold (after shift normalization)")
        return 0
    for q, med, best, v, r in flagged:
        print(f"  {q}: median-prior {med}s (best {best}s) -> {v}s "
              f"({r:.2f}x raw, {r / max(g, 1.0):.2f}x shift-normalized)")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
