"""CORRECTNESS rotation manifest (r16 verdict item 5 / r17 item 6).

Scans every committed CORRECTNESS_r*.json and emits, per declared
query, the LAST round the driver's oracle gate certified it — the
staleness signal the 50-lane sample pick should feed on, so a lane
whose semantics-relevant code changed in round N is never left
uncertified for several rounds by rotation luck (the r17 gap:
q272/q274/q278/q268/q263 changed and were not in the sample).

Usage:
    python tools/rotation_manifest.py [--repo /root/repo] \
        [--changed q272_x q278_y ...] [--pick 50]

Writes tools/rotation_manifest.json:
    {"last_checked": {lane: round | null, ...},
     "never_checked": [...],
     "recommended_sample": [...]}   # --pick lanes: changed-this-round
                                    # first, then by max staleness

The recommendation also drives the builder's own in-round oracle runs
(tools/oracle_check.py <recommended lanes>) so every touched lane is
re-certified against DuckDB before the round closes even when the
driver's rotation misses it.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_manifest(repo: str) -> dict[str, int | None]:
    from patientdataintegration_spark.suite import QUERIES

    last: dict[str, int | None] = {name: None for name in QUERIES}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for lane, rec in data.items():
            if lane not in last:
                continue
            ok = (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            )
            if ok and (last[lane] is None or rnd > last[lane]):
                last[lane] = rnd


    return last


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--changed", nargs="*", default=[],
                    help="lanes whose code changed this round — always "
                         "first in the recommended sample")
    ap.add_argument("--pick", type=int, default=50)
    args = ap.parse_args()

    last = build_manifest(args.repo)
    never = sorted(l for l, r in last.items() if r is None)
    # staleness order: never-checked first, then oldest round, then name
    by_staleness = sorted(
        last, key=lambda l: (last[l] if last[l] is not None else -1, l)
    )
    changed = [l for l in args.changed if l in last]
    rest = [l for l in by_staleness if l not in set(changed)]
    rec = (changed + rest)[: args.pick]

    out = {
        "last_checked": {l: last[l] for l in sorted(last)},
        "never_checked": never,
        "changed_this_round": changed,
        "recommended_sample": rec,
    }
    path = os.path.join(args.repo, "tools", "rotation_manifest.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {path}: {len(last)} lanes, {len(never)} never driver-"
          f"checked, recommended sample of {len(rec)}")
    stale = [(l, last[l]) for l in by_staleness[:15]]
    print("most stale:", stale)


if __name__ == "__main__":
    main()
