"""Single gate entry point (round-4 verdict item 7).

Rounds 2 (NTZ), 3 (q42/q141), and 4 (the Dataset.observe session-
poisoning bug) each shipped a defect that the existing tools would
have caught *if they had been run last*. This script closes that
process gap: ONE command that runs, in order,

  1. the full pytest suite,
  2. the oracle gate at every requested scale factor
     (default sf0.001 + sf0.01; pass --sf to change),
  3. the registry-wide plan-shape audit,
  4. the bench-vs-median regression report (advisory unless --strict-bench),

and exits non-zero on any red — so "the snapshot commit is the last
*verified* commit" is a one-command invariant, not a discipline.

Each stage's full output is written to a log file; when --round N is
given, the oracle logs are written as ORACLE_RUN_r{N}_sf{sf}.log at
the repo root (the files the judge reads), and a GATE_r{N}.json
summary records per-stage status + the HEAD commit the gate ran on.

Usage:
  python tools/gate.py                       # default: pytest + sf0.001/sf0.01 oracle + plan audit + bench diff
  python tools/gate.py --round 5             # also write ORACLE_RUN_r5_*.log + GATE_r5.json
  python tools/gate.py --sf 0.001 --sf 0.01 --sf 0.1
  python tools/gate.py --skip-pytest         # iterate on oracle/plan only
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], log_path: str) -> tuple[int, float]:
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.run(
            cmd, cwd=REPO, stdout=log, stderr=subprocess.STDOUT
        )
    return proc.returncode, time.time() - t0


def _head_commit() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"],
                cwd=REPO,
                capture_output=True,
                text=True,
            ).stdout.strip()
        )
    except Exception:
        return "unknown"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument(
        "--sf",
        action="append",
        default=None,
        help="scale factor(s) for the oracle gate (repeatable)",
    )
    ap.add_argument("--skip-pytest", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument(
        "--strict-bench",
        action="store_true",
        help="treat bench regressions as gate failures (default: advisory)",
    )
    ap.add_argument(
        "--commit",
        action="store_true",
        help=(
            "require a clean working tree, run all stages, and on "
            "green commit the gate record itself (logs + GATE json) "
            "so the snapshot commit IS the gate-record commit — its "
            "parent is the gated code commit and its diff is "
            "logs-only, closing the r2-r5 post-gate-change loophole. "
            "Requires --round."
        ),
    )
    args = ap.parse_args()
    sfs = args.sf or ["0.001", "0.01"]
    tag = f"_r{args.round:02d}" if args.round is not None else ""

    if args.commit:
        if args.round is None:
            print("[gate] --commit requires --round")
            return 2
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.strip()
        if dirty:
            print(
                "[gate] --commit refused: working tree not clean — the "
                "gate must run on exactly the committed code:\n" + dirty
            )
            return 2

    stages: dict[str, dict] = {}
    red = False

    def record(name: str, rc: int, dt: float, log: str, gate: bool = True):
        nonlocal red
        ok = rc == 0
        stages[name] = {
            "ok": ok,
            "exit_code": rc,
            "seconds": round(dt, 1),
            "log": os.path.relpath(log, REPO),
            "gating": gate,
        }
        status = "PASS" if ok else ("FAIL" if gate else "warn")
        print(f"[gate] {name}: {status} ({dt:.0f}s) -> {log}")
        if gate and not ok:
            red = True

    if not args.skip_pytest:
        log = os.path.join(REPO, f"GATE{tag}_pytest.log")
        rc, dt = _run(
            [sys.executable, "-m", "pytest", "tests/", "-q"], log
        )
        record("pytest", rc, dt, log)

    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        if args.round is not None:
            # unambiguous tag from the FULL sf string (r5 ADVICE: the
            # old digits-after-the-dot scheme collided for '0.1' and
            # an integer '1'): 0.001 -> sf0001, 0.01 -> sf001,
            # 0.1 -> sf01, 1 -> sf1
            tag_sf = sf.replace(".", "")
            log = os.path.join(
                REPO, f"ORACLE_RUN_r{args.round:02d}_sf{tag_sf}.log"
            )
        else:
            log = os.path.join(REPO, f"GATE_oracle_sf{sf}.log")
        rc, dt = _run(
            [sys.executable, "tools/oracle_check.py", sf_dir], log
        )
        record(f"oracle_sf{sf}", rc, dt, log)

    log = os.path.join(REPO, f"GATE{tag}_plan_audit.log")
    rc, dt = _run([sys.executable, "tools/plan_audit.py"], log)
    record("plan_audit", rc, dt, log)

    if not args.skip_bench:
        log = os.path.join(REPO, f"GATE{tag}_bench_diff.log")
        rc, dt = _run([sys.executable, "tools/bench_diff.py"], log)
        record("bench_diff", rc, dt, log, gate=args.strict_bench)

    summary = {
        "head_commit": _head_commit(),
        "when_unix": int(time.time()),
        "scale_factors": sfs,
        "stages": stages,
        "green": not red,
    }
    if args.round is not None:
        with open(os.path.join(REPO, f"GATE_r{args.round:02d}.json"), "w") as f:
            json.dump(summary, f, indent=2)
    print(json.dumps({"green": summary["green"], "head": summary["head_commit"]}))

    if args.commit and not red:
        # Logs-only commit: the parent is the gated code commit
        # (summary["head_commit"]); anyone can verify no source
        # changed between gate and snapshot with a one-line diff.
        record_paths = [stage["log"] for stage in stages.values()]
        record_paths.append(f"GATE_r{args.round:02d}.json")
        subprocess.run(["git", "add", "--"] + record_paths, cwd=REPO, check=True)
        subprocess.run(
            [
                "git",
                "commit",
                "-m",
                f"round {args.round}: gate record "
                f"(green on {summary['head_commit'][:9]})",
            ],
            cwd=REPO,
            check=True,
        )
        print("[gate] gate record committed")
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
