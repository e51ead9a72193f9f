#!/usr/bin/env python
"""End-to-end usage demo: what a user of the reference pipeline runs
after switching to this engine.

    python examples/run_pipeline.py /path/to/statements /path/to/out \
        [--configs /path/to/configs]

Equivalent to the reference's four entry points
(etl.py → refine.py → load_to_db.py → db_to_*_RFM.py) as ONE lazy
Spark plan per stage:

1. extract   : directory of raw bank CSV/HTML statements → canonical fact
2. transform : rule-driven refine (cards, payments, merchants, types)
3. load      : surrogate keys + partitioned parquet warehouse
4. analyze   : card-portfolio RFM report written as Excel-ready CSV
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir", help="directory of raw bank statements")
    ap.add_argument("out_dir", help="output directory (warehouse + reports)")
    ap.add_argument("--configs", default=None, help="config dir (cards.csv, "
                    "payment_gateway.csv, merchants.csv, transaction_types.yaml)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.operators import rfm as rfm_ops
    from credit_card_etl_pipeline_spark.plans.etl import run_etl
    from credit_card_etl_pipeline_spark.plans.refine import RefineConfig, refine
    from credit_card_etl_pipeline_spark.session import get_spark
    from credit_card_etl_pipeline_spark.sources.sinks import write_csv_bom
    from credit_card_etl_pipeline_spark.warehouse import to_warehouse, write_warehouse

    spark = get_spark(app_name="run_pipeline")

    # 1-2. extract + transform
    raw = run_etl(spark, args.data_dir)
    config = (
        RefineConfig.from_config_dir(args.configs)
        if args.configs
        else RefineConfig()
    )
    refined = refine(raw, config)

    # 3. load
    wh_path = os.path.join(args.out_dir, "all_transactions")
    wh = to_warehouse(refined)
    n = write_warehouse(wh, wh_path, expected_rows=wh.count())
    print(f"warehouse: {n} rows → {wh_path}")

    # 4. analyze: card RFM (the reference's db_to_card_RFM report)
    table = spark.read.parquet(wh_path)
    clean = rfm_ops.exclude_bank_noise(table).where(
        F.col("card_name").isNotNull() & (F.col("card_name") != "")
    )
    if clean.take(1):
        agg = rfm_ops.rfm_aggregate(
            clean,
            ["bank_name", "card_name"],
            date_col="transaction_date",
            id_col="transaction_id",
            amount_col="payment_amount",
            rank_metrics=("f", "m"),
        )
        report = rfm_ops.with_avg_ticket(agg).withColumn(
            "segment", rfm_ops.label_card_segment()
        ).orderBy(F.desc("monetary"))
        csv_path = os.path.join(args.out_dir, "card_rfm_result.csv")
        write_csv_bom(report, csv_path)
        print(f"card RFM report → {csv_path}")
        report.show(10, truncate=False)
    else:
        print("no card-labelled rows — skipping RFM report")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
