#!/usr/bin/env python
"""Scale soak: run the flagship RFM dual-window on a fact inflated far
past the bench corpus, with enough groups (> functions.ranks
SMALL_INPUT_THRESHOLD) to drive the DISTRIBUTED two-pass rank path
end-to-end — the configuration the unit tests can only simulate.

    python tools/soak.py [--mult 40] [--sf /root/testdata/sf0.1]

mult=40 over sf0.1 orders ≈ 6M rows / 3M groups (past the 2M rank
threshold).  Prints one JSON line with row counts, the chosen rank
strategy, and wall time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=40)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.functions.ranks import (
        SMALL_INPUT_THRESHOLD,
    )
    from credit_card_etl_pipeline_spark.operators import rfm as rfm_ops
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak")
    orders = spark.read.parquet(f"{args.sf}/orders.parquet")

    # Inflate: each order becomes `mult` rows with distinct synthetic
    # group keys, so |groups| scales with mult (near-unique keys = the
    # adversarial case for ranking).
    fact = orders.select(
        F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias("rep"),
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amt"),
    ).select(
        (F.col("o_orderkey") * args.mult + F.col("rep")).alias("gkey"),
        (F.col("o_orderkey") * args.mult + F.col("rep")).alias("id"),
        "d",
        (F.col("amt") + F.col("rep")).alias("amt"),
    )

    t0 = time.perf_counter()
    res = rfm_ops.rfm_dual_window(
        fact, ["gkey"], date_col="d", id_col="id", amount_col="amt"
    )
    n_out = res.count()
    wall = time.perf_counter() - t0

    n_groups = n_out
    print(
        json.dumps(
            {
                "metric": "soak_rfm_dual_window_sec",
                "value": round(wall, 2),
                "unit": "sec",
                "fact_rows": orders.count() * args.mult,
                "groups": n_groups,
                "rank_path": "distributed"
                if n_groups >= SMALL_INPUT_THRESHOLD
                else "single-window",
                "threshold": SMALL_INPUT_THRESHOLD,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
