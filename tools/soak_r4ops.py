#!/usr/bin/env python
"""Scale soak for the round-4 operators: rolling 7-day distinct users,
point-in-time join, and the salted skew join, each on a fact inflated
far past the bench corpus — the shapes whose costs change character
with volume (explode expansion, per-key window width, hot-key task
spread).

    python tools/soak_r4ops.py [--mult 30] [--sf /root/testdata/sf0.1]

mult=30 over sf0.1 events = 3M event rows (with a deliberately hot
user for the salted join).  Prints one JSON line per op with row
counts and wall seconds.
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
    ap.add_argument("--mult", type=int, default=30)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.functions.eventtime import (
        event_micros,
    )
    from credit_card_etl_pipeline_spark.operators.skew import (
        salted_broadcastless_join,
    )
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak_r4ops")
    ev = spark.read.parquet(f"{args.sf}/events.parquet")

    # Inflate: each event becomes `mult` rows spread over mult distinct
    # users and shifted days; one user (id 0) stays HOT — it receives
    # every replica of every 10th source row.
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        event_micros(ev).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    fact = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias("rep"),
        "*",
    ).select(
        (F.col("event_id") * args.mult + F.col("rep")).alias("event_id"),
        F.when(F.col("event_id") % 10 == 0, F.lit(0))
        .otherwise(F.col("user_id") * args.mult + F.col("rep"))
        .alias("user_id"),
        "event_type",
        (F.col("us") + F.col("rep") * 86_400_000_000).alias("us"),
        "vc",
    )
    fact = fact.repartition(64).persist()
    n = fact.count()
    results = {"mult": args.mult, "fact_rows": n}

    # --- rolling 7-day distinct users (bounded 7x explode) ----------
    t0 = time.perf_counter()
    ud = fact.select(
        "user_id", F.expr("us div 86400000000").alias("day")
    ).distinct()
    d1 = ud.agg(F.max("day").alias("d1"))
    rolled = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + F.lit(6))
            ).alias("obs_day"),
        )
        .distinct()
        .join(F.broadcast(d1), F.col("obs_day") <= F.col("d1"))
        .groupBy("obs_day")
        .agg(F.count(F.lit(1)).alias("n_users_7d"))
    )
    results["rolling_days"] = rolled.count()
    results["rolling_s"] = round(time.perf_counter() - t0, 2)

    # --- point-in-time join (union + window fill, one shuffle) ------
    t0 = time.perf_counter()
    dim = fact.where(F.col("event_id") % 2 == 0).select(
        "user_id", "us", F.lit(0).alias("tag"), "event_id", "event_type"
    )
    probes = fact.where(F.col("event_id") % 2 == 1).select(
        "user_id", "us", F.lit(1).alias("tag"), "event_id",
        F.lit(None).cast("string").alias("event_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pit = (
        dim.unionByName(probes)
        .withColumn("asof", F.last("event_type", ignorenulls=True).over(w))
        .where(F.col("tag") == 1)
    )
    results["pit_rows"] = pit.count()
    results["pit_s"] = round(time.perf_counter() - t0, 2)

    # --- salted join with the hot key -------------------------------
    t0 = time.perf_counter()
    dim_users = fact.select("user_id").distinct().select(
        "user_id", (F.col("user_id") % 7).alias("segment")
    )
    joined = salted_broadcastless_join(
        fact.select("user_id", "event_id", "vc"),
        dim_users,
        "user_id",
        n_salts=16,
        salt_source="event_id",
    )
    agg = joined.groupBy("segment").agg(F.sum("vc").alias("cents"))
    results["salted_segments"] = agg.count()
    results["salted_s"] = round(time.perf_counter() - t0, 2)

    fact.unpersist()
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
