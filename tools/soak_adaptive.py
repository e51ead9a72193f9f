#!/usr/bin/env python
"""Measure the plain-vs-salted crossover that sets
``operators.skew.HOT_PARTITION_FACTOR``.

Builds synthetic corpora where ONE key's share of the table sweeps from
uniform to dominant, then times the plain groupBy against the two-stage
salted plan on identical data, for BOTH payload classes:

* ``jvm``  — algebraic sum/count (map-side partial aggregation);
* ``udaf`` — pandas grouped-agg sum (combine-free: no partial agg,
  every hot-key row shuffles to one Python task).

The decision metric is x_even = max_n / (total / shuffle_partitions) —
the multiple of the perfectly-even per-partition load the hottest key
represents.  Result (10M rows, 1024 keys, local[32], 2026-08-14): the
jvm payload NEVER favors salting (partial aggregation collapses the hot
key per input partition); the udaf payload crosses over between
x_even 3.9 (plain wins) and 8.0 (salted wins) — hence the shipped
HOT_PARTITION_FACTOR = 6 applies only to combine_free payloads.

    python tools/soak_adaptive.py [rows]

Prints one JSON line per (payload, hot-share) configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from credit_card_etl_pipeline_spark.operators.skew import (  # noqa: E402
    salted_aggregate,
    salted_count,
    salted_sum,
)
from credit_card_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_keys = 1024
    spark = get_spark(app_name="soak_adaptive")
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # must be built AFTER the session exists (return-type DDL parse)
    @pandas_udf("long")
    def _psum(v: pd.Series) -> int:
        return int(v.sum())

    def run(df):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    for hot_pct in (0, 3, 6, 12, 25, 50):
        # key 0 takes hot_pct% of rows; the rest spread over n_keys
        base = spark.range(rows).select(
            F.col("id"),
            F.when((F.col("id") % 100) < hot_pct, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .alias("k"),
            (F.col("id") % 997).alias("v"),
        )
        base = base.localCheckpoint()  # freeze input; time only the agg

        stats = (
            base.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum("n").alias("t"), F.max("n").alias("m"))
            .first()
        )
        x_even = float(stats["m"]) / (float(stats["t"]) / parts)

        jvm_aggs = [salted_count("n"), salted_sum("v", "sv")]
        salt = F.pmod(F.xxhash64("id"), F.lit(16))
        plans = {
            "jvm": (
                base.groupBy("k").agg(*[a.partial for a in jvm_aggs]),
                salted_aggregate(
                    base, ["k"], jvm_aggs, n_salts=16, salt_source="id"
                ),
            ),
            "udaf": (
                base.groupBy("k").agg(_psum(F.col("v")).alias("sv")),
                base.withColumn("__salt", salt)
                .groupBy("k", "__salt")
                .agg(_psum(F.col("v")).alias("sv"))
                .groupBy("k")
                .agg(F.sum("sv").alias("sv")),
            ),
        }
        for payload, (plain, salted) in plans.items():
            plain_s = min(run(plain), run(plain))
            salted_s = min(run(salted), run(salted))
            print(
                json.dumps(
                    {
                        "payload": payload,
                        "rows": rows,
                        "hot_share_pct": hot_pct,
                        "x_even": round(x_even, 2),
                        "plain_s": round(plain_s, 3),
                        "salted_s": round(salted_s, 3),
                        "salted_wins": salted_s < plain_s,
                    }
                ),
                flush=True,
            )
        base.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
