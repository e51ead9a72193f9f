#!/usr/bin/env python
"""Graph + sketch analytics demo over the event stream.

    python examples/analyze_graph.py [--sf /root/testdata/sf0.01]

Derives the user hand-off graph from the events fact (edge u→v when
v's event directly follows u's within an event_type stream), then runs
the round-5 graph/sketch operators over it:

1. PageRank        : 3 rounds, exact integer micro-units
2. Triangles       : degree-ordered wedge join, per-node counts
3. Reachability    : Spark 4 recursive CTE, 2 hops from seed users
4. HLL set algebra : distinct-customer union/intersection estimates
                     next to exact counts

Prints compact summaries of each.
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

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.dataops.graph import (
        pagerank,
        triangle_counts,
    )
    from credit_card_etl_pipeline_spark.queries.dataops_queries import (
        sketch_hll_intersection,
    )
    from credit_card_etl_pipeline_spark.queries.sql_queries import (
        sql_recursive_reachability,
    )
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="analyze_graph")
    events = spark.read.parquet(f"{args.sf}/events.parquet")

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", F.lead("user_id").over(w).alias("nxt")
    )
    edges = (
        seq.where(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("user_id")))
        .groupBy(F.col("user_id").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(True)
    )
    print(f"hand-off graph: {edges.count()} weighted edges")

    ranks = pagerank(edges, iters=3)
    top = ranks.orderBy(F.desc("rank"), "node").limit(5).collect()
    print("top PageRank users:",
          [(r["node"], r["rank"]) for r in top])

    tris = triangle_counts(edges)
    t = tris.agg(
        F.sum("n_triangles").alias("s"), F.max("n_triangles").alias("m")
    ).collect()[0]
    print(f"triangles: total={int(t['s'] or 0) // 3} "
          f"max-per-node={t['m']}")

    reach = sql_recursive_reachability(spark, args.sf)
    r = reach.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_paths").alias("p")
    ).collect()[0]
    print(f"2-hop reachability from seeds: {r['n']} nodes, "
          f"{r['p']} path-visits")

    hll = sketch_hll_intersection(spark, args.sf).collect()[0]
    print(
        "customer overlap (URGENT vs HIGH): "
        f"est={hll['est_intersection']:.1f} exact={hll['n_exact']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
