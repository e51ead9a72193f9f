#!/usr/bin/env python
"""End-to-end lifecycle soak: the full reference pipeline
(ingest → refine → warehouse → RFM report) against a statement corpus
inflated far past fixture scale.

Statement corpora grow as MORE FILES (a file per bank per month), not
bigger files — so the soak replicates the five committed fixture
statements across N synthetic months (distinct filenames, same bytes),
then runs the same stages as examples/run_pipeline.py and times each.

    python tools/soak_pipeline.py [--months 100] [--out /tmp/soak_pipe]

5 fixtures x N months = 5N files.  Prints one JSON line with per-stage
wall seconds and row counts.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "statements",
)


def build_corpus(dst: str, months: int) -> int:
    """Replicate each fixture statement under month-varied filenames
    (the year/month parser reads ROC or western yyyymm from the name)."""
    n = 0
    for fname in os.listdir(FIXTURES):
        src = os.path.join(FIXTURES, fname)
        stem, ext = os.path.splitext(fname)
        for i in range(months):
            y, m = 2018 + i // 12, 1 + i % 12
            if "113年" in stem:  # ROC-calendar filename pattern
                roc = 107 + i // 12
                new = f"玉山銀行{roc}年{m}月{ext}"
            else:
                bank = stem.rsplit("_", 1)[0]
                new = f"{bank}_{y}{m:02d}{ext}"
            out = os.path.join(dst, new)
            if not os.path.exists(out):
                shutil.copyfile(src, out)
                n += 1
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--months", type=int, default=100)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.operators import rfm as rfm_ops
    from credit_card_etl_pipeline_spark.plans.etl import run_etl
    from credit_card_etl_pipeline_spark.plans.refine import (
        RefineConfig,
        refine,
    )
    from credit_card_etl_pipeline_spark.session import get_spark
    from credit_card_etl_pipeline_spark.warehouse import (
        to_warehouse,
        write_warehouse,
    )

    out_root = args.out or tempfile.mkdtemp(prefix="soak_pipe_")
    data_dir = os.path.join(out_root, "statements")
    os.makedirs(data_dir, exist_ok=True)
    n_files = build_corpus(data_dir, args.months)

    spark = get_spark(app_name="soak_pipeline")
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    raw = run_etl(spark, data_dir)
    raw = raw.persist()
    n_raw = raw.count()
    timings["ingest_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    refined = refine(raw, RefineConfig()).persist()
    n_refined = refined.count()
    timings["refine_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    wh_path = os.path.join(out_root, "all_transactions")
    wh = to_warehouse(refined)
    n_wh = write_warehouse(wh, wh_path, expected_rows=n_refined)
    timings["warehouse_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    table = spark.read.parquet(wh_path)
    clean = rfm_ops.exclude_bank_noise(table).where(
        F.col("card_name").isNotNull() & (F.col("card_name") != "")
    )
    n_report = 0
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
        )
        n_report = report.count()
    timings["rfm_s"] = round(time.perf_counter() - t0, 2)
    raw.unpersist()
    refined.unpersist()

    print(
        json.dumps(
            {
                "months": args.months,
                "n_files": n_files,
                "n_raw": n_raw,
                "n_refined": n_refined,
                "n_warehouse": n_wh,
                "n_report_rows": n_report,
                **timings,
                "total_s": round(sum(timings.values()), 2),
            }
        )
    )
    if not args.out:
        shutil.rmtree(out_root, ignore_errors=True)
    return 0 if n_raw > 0 and n_wh == n_refined else 1


if __name__ == "__main__":
    raise SystemExit(main())
