#!/usr/bin/env python
"""Product-analytics demo over the event stream.

    python examples/analyze_product.py [--sf /root/testdata/sf0.01]

Runs the behavioral-analytics query family end to end on one
SparkSession and prints compact summaries:

1. Sessionization    : 30-min inactivity gap, per-user session stats
2. Funnels           : unbounded AND 7-day-conversion-window variants
3. Retention         : weekly cohort triangle (first 3 cohorts)
4. Concurrency       : sweep-line peak simultaneous sessions per type
5. Outliers          : median/MAD robust flags per event type
6. Forecast backtest : seasonal-naive WAPE per event type
7. Co-occurrence     : type-pair affinity (squared-cosine ppm)

Every number these queries print is oracle-checked in the driver
battery — the demo just shows the user-facing composition.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.queries import QUERIES
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="analyze_product")
    sf = args.sf

    sess = QUERIES["events_sessionization"](spark, sf)
    stats = sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.avg("n_events").alias("avg_events"),
        (F.avg("dur_us") / 60_000_000).alias("avg_minutes"),
    ).first()
    print(
        f"sessions: {stats.n_sessions} across {stats.n_users} users, "
        f"avg {stats.avg_events:.1f} events / {stats.avg_minutes:.1f} min"
    )

    f_all = QUERIES["events_funnel_conversion"](spark, sf).first()
    f_7d = QUERIES["events_windowed_funnel"](spark, sf).first()
    print(
        "funnel signup→click→purchase: "
        f"unbounded {f_all.n_signup}→{f_all.n_click_after}"
        f"→{f_all.n_purchase_funnel}, "
        f"7-day windows {f_7d.n_signup}→{f_7d.n_click_7d}"
        f"→{f_7d.n_purchase_7d}"
    )

    ret = QUERIES["events_cohort_retention"](spark, sf)
    tri = (
        ret.orderBy("cohort_week", "week_offset")
        .groupBy("cohort_week")
        .agg(
            F.max(F.when(F.col("week_offset") == 0, F.col("n_users"))).alias(
                "w0"
            ),
            F.max(F.when(F.col("week_offset") == 1, F.col("n_users"))).alias(
                "w1"
            ),
            F.max(F.when(F.col("week_offset") == 2, F.col("n_users"))).alias(
                "w2"
            ),
        )
        .orderBy("cohort_week")
        .limit(3)
        .collect()
    )
    for r in tri:
        print(
            f"cohort {r.cohort_week}: w0={r.w0} w1={r.w1 or 0} w2={r.w2 or 0}"
        )

    for row in (
        QUERIES["events_max_concurrency"](spark, sf)
        .orderBy("event_type")
        .collect()
    ):
        print(
            f"concurrency[{row.event_type}]: peak {row.max_concurrent} "
            f"of {row.n_intervals} intervals"
        )

    for row in (
        QUERIES["events_outliers_mad"](spark, sf).orderBy("event_type").collect()
    ):
        print(
            f"outliers[{row.event_type}]: {row.n_outliers}/{row.n} beyond "
            f"3 MAD (median {row.med2_cents / 200:.2f})"
        )

    for row in (
        QUERIES["events_seasonal_backtest"](spark, sf)
        .orderBy("event_type")
        .collect()
    ):
        print(
            f"backtest[{row.event_type}]: WAPE "
            f"{row.wape_permille / 10:.1f}% over {row.n_backtest_days} days"
        )

    top = (
        QUERIES["events_type_cooccurrence"](spark, sf)
        .orderBy(F.col("cosine2_ppm").desc())
        .limit(3)
        .collect()
    )
    for row in top:
        print(
            f"affinity {row.type_a}~{row.type_b}: "
            f"{row.co_users} shared users, cos² {row.cosine2_ppm} ppm"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
