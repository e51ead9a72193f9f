#!/usr/bin/env python
"""Round-close artifact-parity gate: every committed audit artifact's
query set (audited ∪ recorded errors ∪ recorded exclusions) must equal
the LIVE registry at HEAD (VERDICT r9 ask #3 — r9 shipped a plan audit
at 213/214 because the registry grew after the audit ran; this gate
makes that impossible to miss).

    python tools/artifact_parity.py [--artifacts PLAN_AUDIT.json,...]

Scope (VERDICT r10 ask #4 widened this from 3 artifacts to every
committed audit):

* FULL-COVERAGE artifacts — set equality vs the registry:
    - PLAN_AUDIT.json
    - every SHUFFLE_AUDIT*.json at the repo root (audited ∪ errors ∪
      excluded_streaming ∪ excluded_other; scale audits record their
      cost exclusions in-file via shuffle_audit.py --exclude)
    - the newest CORRECTNESS_FULL_r*, CORRECTNESS_CLUSTER_r*, and
      CORRECTNESS_HOSTILE_r* (older rounds are historical record,
      pinned to the registry of their day)
* SUBSET artifacts — stale-only (every query named must exist in the
  registry; coverage is a deliberate subset, recorded in-file):
    - the newest LADDER_*, SOAK_*, and CORRECTNESS_SKEW* of each
      family (filename with the _rNN suffix stripped)

Provenance (VERDICT r10 ask #3): the newest CORRECTNESS_* artifacts
and every SHUFFLE_AUDIT* must carry a ``__meta__`` header recording at
least {master, sf, loadavg, wall_s} — a sweep whose certification axis
(local[32] vs local-cluster, corpus dir, host state) is not readable
from the artifact itself fails the gate.  Grandfather clause: r10-and-
older artifacts predate the header and are exempt; the gate applies it
from r11 on.

Exits 1 listing any registered query missing from a full-coverage
artifact, any artifact entry no longer in the registry, and any
missing provenance header.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

#: first round whose artifacts must carry the __meta__ header
META_REQUIRED_FROM_ROUND = 11
META_REQUIRED_KEYS = ("master", "sf", "loadavg", "wall_s")


def artifact_names(path: str) -> set[str]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d and isinstance(d["queries"], dict):
        names = set(d["queries"])
        names |= set(d.get("errors", {}) or {})
        names |= set(d.get("excluded_streaming", []) or [])
        names |= set(d.get("excluded_other", {}) or {})
        return names
    # CORRECTNESS_*: flat {query: result} mapping (+ __meta__ header)
    return {k for k in d if not k.startswith("__")}


def _round_of(path: str) -> int:
    m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
    return int(m.group(1)) if m else -1


def _newest(pattern: str) -> str | None:
    hits = sorted(
        glob.glob(os.path.join(ROOT, pattern)),
        key=lambda p: (_round_of(p), p),
    )
    return hits[-1] if hits else None


def _family(path: str) -> str:
    return re.sub(r"_r\d+\.json$", "", os.path.basename(path))


def check_meta(path: str) -> str | None:
    """None if the provenance header is fine (or exempt), else why."""
    if 0 <= _round_of(path) < META_REQUIRED_FROM_ROUND:
        return None  # grandfathered (pre-r11 artifact)
    with open(path) as fh:
        d = json.load(fh)
    meta = d.get("__meta__")
    if not isinstance(meta, dict):
        return "missing __meta__ provenance header"
    absent = [k for k in META_REQUIRED_KEYS if k not in meta]
    if absent:
        return f"__meta__ lacks {absent}"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--artifacts",
        default=None,
        help="comma-separated artifact paths to check as FULL-COVERAGE "
        "(default: auto-discover per the module docstring)",
    )
    args = ap.parse_args()

    from credit_card_etl_pipeline_spark import queries as q

    registry = set(q.QUERIES)

    if args.artifacts:
        full_paths = [
            p.strip() for p in args.artifacts.split(",") if p.strip()
        ]
        subset_paths: list[str] = []
    else:
        full_paths = [os.path.join(ROOT, "PLAN_AUDIT.json")]
        full_paths += sorted(glob.glob(os.path.join(ROOT, "SHUFFLE_AUDIT*.json")))
        for fam in (
            "CORRECTNESS_FULL_r*.json",
            "CORRECTNESS_CLUSTER_r*.json",
            "CORRECTNESS_HOSTILE_r*.json",
        ):
            p = _newest(fam)
            if p:
                full_paths.append(p)
        # newest of each subset family
        subset_candidates = (
            glob.glob(os.path.join(ROOT, "LADDER_*.json"))
            + glob.glob(os.path.join(ROOT, "SOAK_*.json"))
            + glob.glob(os.path.join(ROOT, "CORRECTNESS_SKEW*.json"))
        )
        by_family: dict[str, str] = {}
        for p in sorted(subset_candidates, key=lambda p: (_round_of(p), p)):
            by_family[_family(p)] = p
        subset_paths = sorted(by_family.values())

    ok = True
    for path in full_paths:
        label = os.path.basename(path)
        if not os.path.exists(path):
            print(f"FAIL  {label}: artifact missing")
            ok = False
            continue
        names = artifact_names(path)
        missing = sorted(registry - names)
        stale = sorted(names - registry)
        meta_err = check_meta(path) if label != "PLAN_AUDIT.json" else None
        if missing or stale or meta_err:
            ok = False
            parts = []
            if missing or stale:
                parts.append(
                    f"{len(missing)} registered queries absent "
                    f"{missing[:10]}, {len(stale)} stale entries "
                    f"{stale[:10]}"
                )
            if meta_err:
                parts.append(meta_err)
            print(f"FAIL  {label}: " + "; ".join(parts))
        else:
            print(f"PASS  {label}: query set == registry ({len(registry)})")

    for path in subset_paths:
        label = os.path.basename(path)
        try:
            with open(path) as fh:
                d = json.load(fh)
        except (OSError, json.JSONDecodeError) as e:
            print(f"FAIL  {label}: unreadable ({e})")
            ok = False
            continue
        qmap = d.get("queries")
        if not isinstance(qmap, dict) and label.startswith("CORRECTNESS"):
            # flat {query: result} correctness subset (skew sweeps)
            qmap = {k: v for k, v in d.items() if not k.startswith("__")}
        if not isinstance(qmap, dict):
            print(f"INFO  {label}: no query map (schema-free soak) — "
                  "stale check not applicable")
            continue
        stale = sorted(set(qmap) - registry)
        if stale:
            ok = False
            print(
                f"FAIL  {label}: {len(stale)} names not in registry "
                f"{stale[:10]} (renamed/deleted queries leave rows that "
                "read as coverage)"
            )
        else:
            print(
                f"PASS  {label}: subset of registry "
                f"({len(qmap)}/{len(registry)} queries, stale-free)"
            )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
