#!/usr/bin/env python
"""Per-family scaling slopes between two bench records.

    python tools/bench_slope.py BENCH_A.json BENCH_B.json [--ratio 10]

A is the smaller scale (e.g. sf0.1), B the larger (e.g. the generated
sf1).  Prints a per-family table: summed seconds at each scale, the
wall ratio, and the implied scaling exponent log(ratio_wall)/log(N) —
1.0 = linear, <1 sub-linear (fixed overheads amortizing), >1 the smell
of a quadratic candidate stage or a spill cliff.  Families are query
name prefixes (first token before '_'), with a few semantic merges.
"""

from __future__ import annotations

import argparse
import json
import math
from collections import defaultdict

_MERGE = {
    "sql": "sql/tpch",
    "orders": "sql/tpch",
    "customers": "sql/tpch",
    "lineitem": "warehouse/layout",
    "warehouse": "warehouse/layout",
    "hypertable": "warehouse/layout",
    "dedup": "dedup",
    "curation": "dedup",
    "documents": "dedup",
    "ann": "ann/embeddings",
    "embeddings": "ann/embeddings",
    "multimodal": "multimodal",
    "stream": "streaming",
    "sketch": "sketches",
    "events": "events",
    "rfm": "rfm/etl",
    "etl": "rfm/etl",
    "refine": "rfm/etl",
    "ingest": "rfm/etl",
    "merchant": "rfm/etl",
    "payment": "rfm/etl",
    "anonymize": "rfm/etl",
    "mock": "rfm/etl",
    "skew": "rfm/etl",
    "text": "text",
    "corpus": "text",
    "dsir": "text",
    "bpe": "text",
    "pii": "text",
    "graph": "graph",
    "parts": "sql/tpch",
}


def fam(name: str) -> str:
    head = name.split("_", 1)[0]
    return _MERGE.get(head, head)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument(
        "--shuffle",
        nargs=2,
        metavar=("AUDIT_A", "AUDIT_B"),
        default=None,
        help="two SHUFFLE_AUDIT json files (small, large scale): adds "
        "per-family shuffle-bytes columns and exponents — shuffle "
        "growing faster than rows is the earliest scale-cliff signal "
        "(VERDICT r8 ask #4)",
    )
    args = ap.parse_args()

    qa = json.load(open(args.a))["queries"]
    qb = json.load(open(args.b))["queries"]
    common = sorted(set(qa) & set(qb))
    fa, fb, fn = defaultdict(float), defaultdict(float), defaultdict(int)
    for q in common:
        fa[fam(q)] += qa[q]
        fb[fam(q)] += qb[q]
        fn[fam(q)] += 1

    sa, sb = defaultdict(float), defaultdict(float)
    if args.shuffle:
        aa = json.load(open(args.shuffle[0]))["queries"]
        ab = json.load(open(args.shuffle[1]))["queries"]
        for q in sorted(set(aa) & set(ab)):
            w = "shuffle_write_bytes"
            sa[fam(q)] += aa[q].get(w, 0)
            sb[fam(q)] += ab[q].get(w, 0)

    def sexp(f: str) -> str:
        if not args.shuffle:
            return ""
        a_mb, b_mb = sa[f] / 1e6, sb[f] / 1e6
        if a_mb <= 0 and b_mb <= 0:
            return f" {'0':>8} {'0':>8} {'—':>6}"
        if a_mb <= 0:
            return f" {a_mb:>8.1f} {b_mb:>8.1f} {'inf':>6}"
        e = math.log(sb[f] / sa[f]) / math.log(args.ratio) if sb[f] else 0.0
        return f" {a_mb:>8.1f} {b_mb:>8.1f} {e:>6.2f}"

    shuf_hdr = (
        f" {'shA(MB)':>8} {'shB(MB)':>8} {'sh exp':>6}" if args.shuffle else ""
    )
    print(
        f"{'family':<20} {'n':>3} {'small(s)':>9} {'large(s)':>9} "
        f"{'wall x':>7} {'exponent':>8}" + shuf_hdr
    )
    rows = sorted(fa, key=lambda f: -fb[f])
    for f in rows:
        r = fb[f] / fa[f] if fa[f] else float("inf")
        exp = math.log(r) / math.log(args.ratio) if r > 0 else float("nan")
        print(
            f"{f:<20} {fn[f]:>3} {fa[f]:>9.1f} {fb[f]:>9.1f} "
            f"{r:>7.2f} {exp:>8.2f}" + sexp(f)
        )
    ta, tb = sum(fa.values()), sum(fb.values())
    line = (
        f"{'TOTAL':<20} {len(common):>3} {ta:>9.1f} {tb:>9.1f} "
        f"{tb / ta:>7.2f} {math.log(tb / ta) / math.log(args.ratio):>8.2f}"
    )
    if args.shuffle:
        tsa, tsb = sum(sa.values()), sum(sb.values())
        te = (
            math.log(tsb / tsa) / math.log(args.ratio)
            if tsa > 0 and tsb > 0
            else float("nan")
        )
        line += f" {tsa/1e6:>8.1f} {tsb/1e6:>8.1f} {te:>6.2f}"
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
