#!/usr/bin/env python
"""Round-close artifact-parity gate: every committed audit artifact's
query set (audited ∪ recorded errors ∪ recorded exclusions) must equal
the LIVE registry at HEAD (VERDICT r9 ask #3 — r9 shipped a plan audit
at 213/214 because the registry grew after the audit ran; this gate
makes that impossible to miss).

    python tools/artifact_parity.py [--artifacts PLAN_AUDIT.json,...]

Checks, per artifact:

* PLAN_AUDIT.json        — audited set == queries()
* SHUFFLE_AUDIT.json     — audited ∪ errors ∪ excluded_streaming ==
                           queries() (streaming queries run their jobs
                           on non-inheriting threads, so they are
                           excluded BY DESIGN and the artifact records
                           the list)
* CORRECTNESS_FULL_r*.json (newest) — checked set == queries()

Exits 1 listing any registered query missing from an artifact and any
artifact entry no longer in the registry (renamed/deleted queries
leave stale rows that would otherwise read as coverage).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def artifact_names(path: str) -> set[str]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d and isinstance(d["queries"], dict):
        names = set(d["queries"])
        names |= set(d.get("errors", {}) or {})
        names |= set(d.get("excluded_streaming", []) or [])
        return names
    # CORRECTNESS_*: flat {query: result} mapping
    return set(d)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--artifacts",
        default=None,
        help="comma-separated artifact paths (default: PLAN_AUDIT.json, "
        "SHUFFLE_AUDIT.json, newest CORRECTNESS_FULL_r*.json)",
    )
    args = ap.parse_args()

    from credit_card_etl_pipeline_spark import queries as q

    registry = set(q.QUERIES)

    if args.artifacts:
        paths = [p.strip() for p in args.artifacts.split(",") if p.strip()]
    else:
        paths = [
            os.path.join(ROOT, "PLAN_AUDIT.json"),
            os.path.join(ROOT, "SHUFFLE_AUDIT.json"),
        ]
        full = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_FULL_r*.json")))
        if full:
            paths.append(full[-1])

    ok = True
    for path in paths:
        label = os.path.basename(path)
        if not os.path.exists(path):
            print(f"FAIL  {label}: artifact missing")
            ok = False
            continue
        names = artifact_names(path)
        missing = sorted(registry - names)
        stale = sorted(names - registry)
        if missing or stale:
            ok = False
            print(
                f"FAIL  {label}: {len(missing)} registered queries absent "
                f"{missing[:10]}, {len(stale)} stale entries {stale[:10]}"
            )
        else:
            print(f"PASS  {label}: query set == registry ({len(registry)})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
