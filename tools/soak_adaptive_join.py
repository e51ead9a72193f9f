#!/usr/bin/env python
"""Measure the join-strategy crossover that drives
``operators.skew.adaptive_join``.

Scenario: fact(10M rows) equi-joined to a dim too big to broadcast
(5M unique keys, forced above the broadcast threshold), with one fact
key's share swept from uniform to dominant.  Competitors on identical
data:

* ``smj``    — plain sort-merge join (AQE on, skew-join split on: the
               runtime splits oversized partitions of the hot key);
* ``salted`` — operators.skew.salted_broadcastless_join (fact salts
               8 ways, dim replicates 8x: the shuffle itself is
               pre-spread, which AQE cannot do).

    python tools/soak_adaptive_join.py [fact_rows]

One JSON line per hot-share configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from credit_card_etl_pipeline_spark.operators.skew import (  # noqa: E402
    salted_broadcastless_join,
)
from credit_card_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_keys = 5_000_000
    spark = get_spark(app_name="soak_adaptive_join")
    # force the non-broadcast regime the operator is choosing within
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("dv")
    ).localCheckpoint()

    def run(df):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    for hot_pct in (0, 3, 6, 12, 25, 50):
        fact = spark.range(rows).select(
            F.col("id"),
            F.when((F.col("id") % 100) < hot_pct, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .alias("k"),
            (F.col("id") % 997).alias("v"),
        ).localCheckpoint()
        mx = fact.groupBy("k").count().agg(F.max("count")).first()[0]
        x_even = float(mx) / (rows / parts)

        smj = fact.join(dim, "k").select("id", "v", "dv")
        salted = salted_broadcastless_join(
            fact, dim, "k", n_salts=8, salt_source="id"
        ).select("id", "v", "dv")
        smj_s = min(run(smj), run(smj))
        salted_s = min(run(salted), run(salted))
        print(
            json.dumps(
                {
                    "fact_rows": rows,
                    "dim_rows": n_keys,
                    "hot_share_pct": hot_pct,
                    "x_even": round(x_even, 2),
                    "smj_s": round(smj_s, 3),
                    "salted_s": round(salted_s, 3),
                    "salted_wins": salted_s < smj_s,
                }
            ),
            flush=True,
        )
        fact.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
