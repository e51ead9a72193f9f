#!/usr/bin/env python
"""Instrumented A/B for the 0.57-0.61 sf1→sf10 wall exponents
(VERDICT r10 ask #6): q11 / q2 / q18 grow ~4x on 10x data while the
other heavy hitters grow ~2x.  Hypotheses: (a) the FIXED
spark.sql.shuffle.partitions=32 at sf10 — AQE can coalesce partitions
DOWN but never split them UP, so 10x rows land on the same 32 reduce
tasks; (b) the scalar-subquery double-scan shape those three queries
share.  (a) is testable by conf alone:

    python tools/ladder_partitions_ab.py [--sfs .scale/sf1,.scale/sf10]
        [--names tpch_q11_important_stock,...]
        [--out LADDER_PARTS_AB.json]

Runs each query per corpus per VARIANT into a noop sink (best-of-2,
idle host required — timing tool) where the variants are:

* base        — the session defaults (shuffle.partitions = 32);
* init256     — spark.sql.adaptive.coalescePartitions.initialPartitionNum
                = 256: shuffles START wide and AQE coalesces down to
                the advisory size, so small corpora keep their plans
                while big corpora actually fan out;
* fixed128    — shuffle.partitions = 128 flat (sanity cross-check:
                if init256 helps but fixed128 helps identically, the
                win is pure width, not AQE shaping).

Writes per-query walls + sf-decade exponents per variant.  The
decision rule recorded by r11: if init256 cuts the sf10 wall of the
0.6-exponent cluster by >=25% while leaving sf1 walls within noise,
session.py gains the conf; otherwise the exponents are documented as
shape-inherent (double-scan) with the A/B as evidence.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_NAMES = (
    "tpch_q11_important_stock,tpch_q2_min_cost_supplier,"
    "tpch_q18_large_volume,tpch_q21_sole_late_supplier"
)

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "init256": {
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
    },
    "fixed128": {"spark.sql.shuffle.partitions": "128"},
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default=".scale/sf1,.scale/sf10")
    ap.add_argument("--names", default=DEFAULT_NAMES)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default="LADDER_PARTS_AB.json")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ladder_parts_ab")
    queries = entrymod.queries()
    names = [n for n in args.names.split(",") if n in queries]
    sfs = args.sfs.split(",")

    defaults = {
        k: spark.conf.get(k, None)
        for v in VARIANTS.values()
        for k in v
    }
    # include the base shuffle.partitions so fixed128 restores cleanly
    defaults["spark.sql.shuffle.partitions"] = spark.conf.get(
        "spark.sql.shuffle.partitions"
    )

    report: dict = {
        "__meta__": {
            "tool": "tools/ladder_partitions_ab.py",
            "master": spark.sparkContext.master,
            "loadavg": [round(x, 2) for x in os.getloadavg()],
            "generated_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
            "repeats": args.repeats,
            "sink": "noop",
        },
        "variants": {k: v for k, v in VARIANTS.items()},
        "queries": {},
    }

    def set_variant(conf: dict[str, str]) -> None:
        for k, dv in defaults.items():
            if dv is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, dv)
        for k, v in conf.items():
            spark.conf.set(k, v)

    for vname, conf in VARIANTS.items():
        set_variant(conf)
        for sf in sfs:
            label = os.path.basename(sf.rstrip("/"))
            for n in names:
                best = None
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    queries[n](spark, sf).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    el = time.perf_counter() - t0
                    best = el if best is None else min(best, el)
                    spark.catalog.clearCache()
                q = report["queries"].setdefault(n, {})
                q.setdefault(vname, {})[label] = round(best, 2)
                print(
                    json.dumps({"q": n, "variant": vname, "sf": label,
                                "sec": q[vname][label]}),
                    flush=True,
                )
    set_variant({})

    # one-decade wall exponents per variant (assumes 2 sfs, 10x apart)
    if len(sfs) == 2:
        lo = os.path.basename(sfs[0].rstrip("/"))
        hi = os.path.basename(sfs[1].rstrip("/"))
        for n, per_v in report["queries"].items():
            for vname, walls in per_v.items():
                if lo in walls and hi in walls and walls[lo] > 0:
                    walls["wall_exponent"] = round(
                        math.log10(walls[hi] / walls[lo]), 2
                    )
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
