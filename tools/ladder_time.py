#!/usr/bin/env python
"""Spark-side wall ladder for a set of registered queries across
corpora (VERDICT r8 ask #6: a second decade of slope for the families
whose exponents decide 100 TB feasibility).

    python tools/ladder_time.py --sfs .scale/sf1,.scale/sf10 \
        [--names a,b,c | --prefixes dedup_,ann_]

Times ONLY the Spark execution (noop sink) per query per corpus — no
DuckDB in the loop, so the numbers divide cleanly into wall
exponents.  Prints one LADDER json line: {name: {sf_label: seconds}}.

The sink is `noop`, NOT collect: collect() adds a driver transfer
proportional to OUTPUT size, which misattributes output-heavy queries
(r10: lineitem_prorate_cents read exponent 1.15 under collect — 366 s
at sf10 — vs 20 s engine wall under noop; the extra 345 s was 60M
rows crossing into the Python driver, a cost no deployed pipeline
pays).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_PREFIXES = (
    "dedup_", "curation_", "curate_", "documents_", "ann_", "embeddings_",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default=".scale/sf1,.scale/sf10")
    ap.add_argument("--names", default=None)
    ap.add_argument("--prefixes", default=",".join(DEFAULT_PREFIXES))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ladder_time")
    queries = entrymod.queries()
    if args.names:
        names = [n for n in args.names.split(",") if n in queries]
    else:
        prefixes = tuple(p for p in args.prefixes.split(",") if p)
        names = [n for n in queries if n.startswith(prefixes)]

    out: dict[str, dict[str, float]] = {}
    for sf in args.sfs.split(","):
        label = os.path.basename(sf.rstrip("/"))
        for n in names:
            t0 = time.time()
            try:
                queries[n](spark, sf).write.mode("overwrite").format(
                    "noop"
                ).save()
                wall = round(time.time() - t0, 2)
                out.setdefault(n, {})[label] = wall
                print(f"LADDERQ {label} {n}: {wall}s", flush=True)
            except Exception as exc:  # noqa: BLE001 — ladder must finish
                out.setdefault(n, {})[label] = -1.0
                print(f"LADDERQ {label} {n}: ERROR {exc!r}"[:300],
                      flush=True)
    print("LADDER " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
