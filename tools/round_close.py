#!/usr/bin/env python
"""Round-close gate runner: executes every verification surface in
sequence and prints one PASS/FAIL line per gate plus a final summary.

    python tools/round_close.py [--skip-bench]

Gates (each also maintained standalone — see the files for usage):

1. pytest            — the unit/property suite (tests/)
2. oracle sweep      — DuckDB hash-parity for all registered queries
                       (tools/check_oracle.py, sf0.01)
3. hostile sweep     — every query under ANSI + non-UTC session
                       (tools/hostile_sweep.py, sf0.001)
4. plan audit        — 0 cartesians / row-wise Python, BNLJ allowlist
                       (tools/plan_audit.py; writes PLAN_AUDIT.json)
5. shuffle audit     — measured bytes moved per query
                       (tools/shuffle_audit.py; writes
                       SHUFFLE_AUDIT.json)
6. artifact parity   — every committed audit's query set must equal
                       the registry at HEAD, exclusions recorded
                       (tools/artifact_parity.py)
7. bench             — full-registry timing (bench.py; writes
                       BENCH_FULL.json) — skippable, ~5 min

The audits re-run HERE, at the final registry, so a query registered
after a mid-round audit can never ship an artifact that lacks it (the
parity gate fails the close instead).

Run gates SEQUENTIALLY on an otherwise-idle host: they are all
Spark-heavy, and concurrent runs contend for the same cores (measured
2x wall-time inflation; see BENCH_HISTORY r7 continuation).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> bool:
    t0 = time.time()
    r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    ok = r.returncode == 0
    tail = (r.stdout + r.stderr).strip().splitlines()[-1:] or [""]
    print(
        f"{'PASS' if ok else 'FAIL'}  {label} "
        f"[{time.time() - t0:.0f}s]  {tail[0][:120]}"
    )
    if not ok:
        sys.stdout.write((r.stdout + r.stderr)[-3000:] + "\n")
    return ok


def _current_round() -> int:
    """Best-effort round number from PROGRESS.jsonl (driver-written)."""
    import json

    try:
        with open(os.path.join(ROOT, "PROGRESS.jsonl")) as fh:
            lines = [ln for ln in fh.read().splitlines() if ln.strip()]
        return int(json.loads(lines[-1]).get("round", 0))
    except Exception:
        return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument(
        "--round", type=int, default=None,
        help="round number for the CORRECTNESS_FULL_r<N>.json artifact "
             "(default: last 'round' in PROGRESS.jsonl)",
    )
    args = ap.parse_args()
    py = sys.executable
    rnd = args.round if args.round is not None else _current_round()
    full_art = os.path.join(ROOT, f"CORRECTNESS_FULL_r{rnd:02d}.json")
    gates = [
        ("pytest", [py, "-m", "pytest", "tests/", "-q"]),
        ("oracle sweep",
         [py, "tools/check_oracle.py", "--json-out", full_art]),
        ("hostile sweep", [py, "tools/hostile_sweep.py"]),
        ("plan audit", [py, "tools/plan_audit.py"]),
        ("shuffle audit", [py, "tools/shuffle_audit.py"]),
        ("artifact parity", [py, "tools/artifact_parity.py"]),
    ]
    if not args.skip_bench:
        gates.append(("bench", [py, "bench.py"]))
    # labeled results (not positional) so a future gate appended after
    # the bench can't steal the loaded-host flag (ADVICE r8)
    results = {label: run(label, cmd) for label, cmd in gates}
    if results.get("bench"):
        # Refuse to stamp a bench-of-record from a loaded host: a start
        # loadavg above cpus/4 inflates every timing (r07: loadavg 14.5
        # read ~15% slow vs the idle re-run).  bench.py wrote the flag
        # into BENCH_FULL.json; surface it as a gate failure so the
        # number never lands in BENCH_HISTORY.md unchallenged.
        import json

        try:
            with open(os.path.join(ROOT, "BENCH_FULL.json")) as fh:
                rec = json.load(fh)
        except Exception:
            rec = {}
        if rec.get("loaded_host_warning"):
            print(f"FAIL  bench-of-record  {rec['loaded_host_warning']}")
            results["bench"] = False
        else:
            # Ambient canary (VERDICT r10 ask #8): bench.py timed a
            # fixed corpus-independent JVM workload pre/post sweep; a
            # ratio over the pinned idle baseline means machine state
            # (page cache, background IO) inflated the numbers even
            # though loadavg looked clean.  Warn loudly at capture time
            # — the flag ships inside the stamped record either way.
            if rec.get("canary_warning"):
                print(f"WARN  bench-canary  {rec['canary_warning']}")
            else:
                c = rec.get("canary", {})
                print(
                    "PASS  bench-canary  ratio_vs_idle="
                    f"{c.get('ratio_vs_idle')} (pre {c.get('pre_s')}s / "
                    f"post {c.get('post_s')}s)"
                )
            # Stamp the idle-host bench as this round's COMMITTED record
            # (VERDICT r9 ask #7): BENCH_FULL.json gets overwritten by
            # loaded-host driver runs, so the per-query + loadavg
            # snapshot must survive as its own artifact for
            # ambient-vs-code attribution.
            rec_path = os.path.join(ROOT, f"BENCH_RECORD_r{rnd:02d}.json")
            with open(rec_path, "w") as fh:
                json.dump(rec, fh, ensure_ascii=False)
            print(f"PASS  bench-of-record -> {os.path.basename(rec_path)}")
    n_ok = sum(results.values())
    print(f"round-close: {n_ok}/{len(results)} gates green")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
