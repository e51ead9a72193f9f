#!/usr/bin/env python
"""Scale soak for the round-5c operators: sessionization, sweep-line
concurrency, trigram fuzzy linkage, largest-remainder proration, and
Bellman-Ford shortest paths, each at a multiple of bench volume.

    python tools/soak_r5cops.py [--mult 30] [--sf /root/testdata/sf0.1]

Prints one JSON line per op with row counts and wall seconds; run at
two mults to read the scaling slope (shuffle-bound ops should grow
near-linearly with the data, never super-linearly).
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

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from credit_card_etl_pipeline_spark.dataops.graph import shortest_paths
    from credit_card_etl_pipeline_spark.functions.eventtime import (
        event_micros,
    )
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak_r5cops")
    out = []

    # --- inflated events: replicas shift users into disjoint id
    # spaces (per-user history length stays realistic; total volume
    # and user count scale together, like a bigger production site)
    ev = spark.read.parquet(f"{args.sf}/events.parquet")
    fact = (
        ev.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias(
                "rep"
            ),
            "event_id",
            "user_id",
            "event_type",
            "ts",
            "value",
        )
        .select(
            (F.col("event_id") * args.mult + F.col("rep")).alias("event_id"),
            (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
            "event_type",
            "ts",
            "value",
        )
        .repartition(64)
        .localCheckpoint(True)
    )
    n_events = fact.count()

    # sessionization: lag → flag → running sum → per-session agg
    t0 = time.time()
    e = fact.select("user_id", "event_id", event_micros(fact).alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_idx",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    n_sessions = (
        sess.groupBy("user_id", "sess_idx")
        .agg(F.count(F.lit(1)).alias("n"))
        .count()
    )
    out.append(
        {
            "op": "sessionization",
            "mult": args.mult,
            "n_events": n_events,
            "n_sessions": n_sessions,
            "sec": round(time.time() - t0, 2),
        }
    )

    # sweep-line max concurrency over the inflated fact
    t0 = time.time()
    iv = fact.select(
        "event_type",
        event_micros(fact).alias("s"),
        (
            event_micros(fact)
            + F.round(F.col("value") * 100).cast("long") * 10000
        ).alias("e"),
    )
    bounds = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionByName(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    net = bounds.groupBy("event_type", "t").agg(
        F.sum("d").cast("long").alias("delta"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
        .cast("long")
        .alias("starts"),
    )
    ws = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peaks = (
        net.withColumn("conc", F.sum("delta").over(ws))
        .groupBy("event_type")
        .agg(F.max("conc").alias("max_conc"))
        .collect()
    )
    out.append(
        {
            "op": "max_concurrency",
            "mult": args.mult,
            "n_events": n_events,
            "max_conc": max(r.max_conc for r in peaks),
            "sec": round(time.time() - t0, 2),
        }
    )

    # shortest paths on the hand-off graph of the inflated fact
    t0 = time.time()
    wg = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = fact.select(
        "user_id", F.lead("user_id").over(wg).alias("nxt")
    )
    edges = (
        seq.where(
            F.col("nxt").isNotNull() & (F.col("nxt") != F.col("user_id"))
        )
        .groupBy(F.col("user_id").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.expr("1000000 div count(*)").cast("long").alias("cost"))
    )
    seeds = (
        fact.where(F.col("user_id") % 29 == 0)
        .select(F.col("user_id").alias("node"))
        .distinct()
    )
    n_reached = shortest_paths(edges, seeds, iters=4).count()
    out.append(
        {
            "op": "shortest_paths",
            "mult": args.mult,
            "n_events": n_events,
            "n_reached": n_reached,
            "sec": round(time.time() - t0, 2),
        }
    )

    # --- trigram fuzzy linkage on an inflated part vocabulary
    part = spark.read.parquet(f"{args.sf}/part.parquet")
    pfact = (
        part.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias(
                "rep"
            ),
            "p_partkey",
            "p_name",
        )
        .select(
            (F.col("p_partkey") * args.mult + F.col("rep")).alias("k"),
            F.concat(
                F.col("p_name"), F.lit(" v"), F.col("rep").cast("string")
            ).alias("name"),
        )
        .repartition(64)
        .localCheckpoint(True)
    )
    n_parts = pfact.count()

    # NOTE: the UNCAPPED variant is gated to mult <= 10.  Measured:
    # 57.9 s at mult 10 and >22 min (killed) at mult 30 — a synthetic
    # inflated vocabulary concentrates every replica of a base name on
    # the same trigrams, so uncapped candidates grow ~quadratically in
    # the replica count and the hot-gram partitions serialize onto one
    # core.  That blow-up is precisely why the stop-gram cap below
    # (and the hot-key caps in dedup.py's LSH/anchor stages) exist.
    run_uncapped = args.mult <= 10
    t0 = time.time()
    master = pfact.select("name").distinct()
    dirty = pfact.where(F.col("k") % 3 == 0).select(
        "k",
        F.concat(
            F.expr("substr(name, 1, CAST(k % length(name) AS INT))"),
            F.expr("substr(name, CAST(k % length(name) AS INT) + 2)"),
        ).alias("dirty_name"),
    )

    def grams(df, col, *keep):
        return (
            df.select(
                *keep,
                F.explode(
                    F.expr(
                        f"transform(sequence(1, greatest(length({col}) - 2,"
                        f" 1)), i -> substr({col}, i, 3))"
                    )
                ).alias("g"),
            )
            .distinct()
        )

    mg = grams(master, "name", "name")
    dg = grams(dirty, "dirty_name", "k", "dirty_name")
    msize = mg.groupBy("name").agg(F.count(F.lit(1)).alias("nb"))
    dsize = dg.groupBy("k").agg(F.count(F.lit(1)).alias("na"))
    if run_uncapped:
        cand = (
            dg.join(mg, "g")
            .groupBy("k", "dirty_name", "name")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        scored = (
            cand.join(dsize, "k")
            .join(msize, "name")
            .where(F.expr("1000 * inter div (na + nb - inter)") >= 400)
        )
        wb = Window.partitionBy("k").orderBy(
            F.col("inter").desc(), "name"
        )
        n_linked = (
            scored.withColumn("rn", F.row_number().over(wb))
            .where(F.col("rn") == 1)
            .count()
        )
        out.append(
            {
                "op": "fuzzy_link",
                "mult": args.mult,
                "n_parts": n_parts,
                "n_linked": n_linked,
                "sec": round(time.time() - t0, 2),
            }
        )

    # prefix-filtered variant (the similarity-join-literature valve):
    # each record blocks ONLY on its 2 globally-rarest grams, so a
    # hot gram stops generating candidates once rarer grams exist —
    # candidate volume tracks the rare-gram document frequencies, not
    # the hottest gram.  (A fixed df cap measured 884.8 s at mult 30:
    # with a 600k-name vocabulary every base trigram's df scales with
    # the replica count, so any absolute threshold eventually admits
    # quadratic hot-gram blocks.  Rarest-r blocking is relative, so
    # it survives vocabulary growth — the 100 TB shape.)
    t0 = time.time()
    df_g = mg.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    wr_m = Window.partitionBy("name").orderBy("df", "g")
    mg_r = (
        mg.join(df_g, "g")
        .withColumn("rn", F.row_number().over(wr_m))
        .where(F.col("rn") <= 2)
        .select("name", "g")
    )
    wr_d = Window.partitionBy("k").orderBy("df", "g")
    dg_r = (
        dg.join(df_g, "g", "left")
        .withColumn("df", F.coalesce("df", F.lit(0)))
        .withColumn("rn", F.row_number().over(wr_d))
        .where(F.col("rn") <= 2)
        .select("k", "g")
    )
    cand_p = dg_r.join(mg_r, "g").select("k", "name").distinct()
    inter = (
        cand_p.join(dg.select("k", "g"), "k")
        .join(
            mg.select(F.col("name").alias("name"), F.col("g").alias("mg_g")),
            "name",
        )
        .where(F.col("g") == F.col("mg_g"))
        .groupBy("k", "name")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    n_linked_p = (
        inter.join(dsize, "k")
        .join(msize, "name")
        .where(F.expr("1000 * inter div (na + nb - inter)") >= 300)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("k").orderBy(F.col("inter").desc(), "name")
            ),
        )
        .where(F.col("rn") == 1)
        .count()
    )
    out.append(
        {
            "op": "fuzzy_link_prefix_filtered",
            "mult": args.mult,
            "n_parts": n_parts,
            "n_linked": n_linked_p,
            "sec": round(time.time() - t0, 2),
        }
    )

    # --- proration over inflated lineitem/orders
    li = spark.read.parquet(f"{args.sf}/lineitem.parquet")
    o = spark.read.parquet(f"{args.sf}/orders.parquet")
    lif = (
        li.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias(
                "rep"
            ),
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
        )
        .select(
            (F.col("l_orderkey") * args.mult + F.col("rep")).alias("k"),
            F.col("l_linenumber").alias("ln"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .repartition(64)
        .localCheckpoint(True)
    )
    of = (
        o.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias(
                "rep"
            ),
            "o_orderkey",
            "o_totalprice",
        )
        .select(
            (F.col("o_orderkey") * args.mult + F.col("rep")).alias("k"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("total_cents"),
        )
        .repartition(64)
        .localCheckpoint(True)
    )
    n_lines = lif.count()

    t0 = time.time()
    wk = Window.partitionBy("k")
    base = (
        lif.join(of, "k")
        .withColumn("qty_sum", F.sum("qty").over(wk))
        .withColumn(
            "floor_cents",
            F.expr("total_cents * qty div qty_sum").cast("long"),
        )
        .withColumn("remainder", F.expr("total_cents * qty % qty_sum"))
    )
    ranked = base.withColumn(
        "rr",
        F.row_number().over(
            wk.orderBy(F.col("remainder").desc(), "ln", "qty")
        ),
    ).withColumn(
        "shortfall",
        (F.col("total_cents") - F.sum("floor_cents").over(wk)).cast("long"),
    )
    n_alloc = ranked.select(
        "k",
        (
            F.col("floor_cents")
            + F.when(F.col("rr") <= F.col("shortfall"), 1).otherwise(0)
        ).alias("alloc_cents"),
    ).count()
    out.append(
        {
            "op": "prorate",
            "mult": args.mult,
            "n_lines": n_lines,
            "n_alloc": n_alloc,
            "sec": round(time.time() - t0, 2),
        }
    )

    for rec in out:
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
