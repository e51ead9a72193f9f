#!/usr/bin/env python
"""Exercise the spill path and certify correctness under it (VERDICT
r8 ask #2).

Every shuffle audit to date showed 0 bytes spilled — the 128 GiB
sandbox never forces memory pressure, so spill-time behavior (sort
spill merges, shuffle writer spills, window buffer spills) was
unproven.  Rather than shrink the heap and hope (heap pressure is
nondeterministic across JVMs), this uses Spark's deterministic
force-spill thresholds: every unsafe sorter, window buffer and SMJ
buffer spills to disk after ``--threshold`` rows, which at sf1
(6M-row lineitem, ~190k rows/task) makes every serious sort/shuffle
stage spill many times over.

Two gates run under the identical hostile conf:

1. ``tools/shuffle_audit.py --sf <corpus> --out SHUFFLE_AUDIT_SPILL
   .json`` — records per-query memory/disk spill bytes; this script
   then ASSERTS the audit saw nonzero disk spill in at least
   ``--min-spillers`` queries (the exercise actually happened);
2. ``tools/check_oracle.py --sf <corpus> --json-out
   CORRECTNESS_SPILL_r<N>.json`` — full-registry DuckDB hash parity:
   results must be identical when every buffer round-trips disk.

    python tools/spill_certify.py [--sf .scale/sf1] [--threshold 65536]
                                  [--round N] [--skip-oracle]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPILL_CONFS = {
    # force UnsafeExternalSorter / ShuffleExternalSorter to spill
    "spark.shuffle.spill.numElementsForceSpillThreshold": None,
    "spark.sql.windowExec.buffer.spill.threshold": None,
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": None,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(ROOT, ".scale", "sf1"))
    ap.add_argument("--threshold", type=int, default=65536)
    ap.add_argument("--min-spillers", type=int, default=10)
    ap.add_argument("--round", type=int, default=9)
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = ";".join(
        f"{k}={args.threshold}" for k in SPILL_CONFS
    )
    py = sys.executable
    audit_out = os.path.join(ROOT, "SHUFFLE_AUDIT_SPILL.json")

    r = subprocess.run(
        [py, "tools/shuffle_audit.py", "--sf", args.sf, "--out", audit_out],
        cwd=ROOT,
        env=env,
    )
    if r.returncode:
        print("FAIL shuffle audit under spill conf")
        return 1
    with open(audit_out) as fh:
        audit = json.load(fh)
    spillers = {
        n: m["disk_spill_bytes"]
        for n, m in audit["queries"].items()
        if m.get("disk_spill_bytes", 0) > 0
    }
    total_spill = audit["totals"]["disk_spill_bytes"]
    print(
        f"spill exercise: {len(spillers)} queries spilled, "
        f"{total_spill/1e6:.1f} MB disk total; top: "
        + json.dumps(
            dict(sorted(spillers.items(), key=lambda kv: -kv[1])[:10])
        )
    )
    if len(spillers) < args.min_spillers:
        print(
            f"FAIL: only {len(spillers)} spilling queries "
            f"(< {args.min_spillers}) — the exercise did not bite; "
            f"lower --threshold"
        )
        return 1

    if args.skip_oracle:
        return 0
    oracle_out = os.path.join(
        ROOT, f"CORRECTNESS_SPILL_r{args.round:02d}.json"
    )
    r = subprocess.run(
        [py, "tools/check_oracle.py", "--sf", args.sf,
         "--json-out", oracle_out],
        cwd=ROOT,
        env=env,
    )
    if r.returncode:
        print("FAIL oracle parity under spill conf")
        return 1
    print(f"spill certification green: {audit_out}, {oracle_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
