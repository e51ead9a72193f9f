#!/usr/bin/env python
"""Scale soak for the round-5b operators: PQ ANN, corpus chunk dedup,
LM typicality, and PageRank, each at a multiple of bench volume.

    python tools/soak_r5bops.py [--mult 30] [--sf /root/testdata/sf0.1]

Prints one JSON line per op with row counts and wall seconds; run at
two mults to read the scaling slope (sub-linear shuffle-bound ops
should grow slower than the data).
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

    from credit_card_etl_pipeline_spark.dataops import curate as cu
    from credit_card_etl_pipeline_spark.dataops import graph as gr
    from credit_card_etl_pipeline_spark.dataops import similarity as sim
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak_r5bops")
    out = []

    # --- corpus chunk dedup + LM typicality on an inflated documents
    # table (replica 0 keeps the original text so cross-replica
    # duplicate chunks are guaranteed)
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    fact = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias("rep"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * args.mult + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") % 3 == 0, F.col("text"))
        .otherwise(
            F.concat(F.lit("v"), F.col("rep").cast("string"), F.lit(" "), F.col("text"))
        )
        .alias("text"),
    ).repartition(64).localCheckpoint(True)
    n_docs = fact.count()

    t0 = time.time()
    n_kept = cu.dedup_corpus_chunks(fact).count()
    out.append(
        {
            "op": "chunk_dedup",
            "mult": args.mult,
            "n_docs": n_docs,
            "n_kept_chunks": n_kept,
            "wall_s": round(time.time() - t0, 2),
        }
    )

    t0 = time.time()
    n_scored = cu.lm_typicality(fact).count()
    out.append(
        {
            "op": "lm_typicality",
            "mult": args.mult,
            "n_docs": n_docs,
            "n_scored": n_scored,
            "wall_s": round(time.time() - t0, 2),
        }
    )

    # --- PQ ANN on an inflated embeddings table (fit once on the base
    # table — the offline-codebook pattern — then encode+score the
    # inflated corpus)
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    vecs0 = emb.select(
        "vec_id",
        sim.quantize(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("qvec"),
    ).localCheckpoint(True)
    big = (
        vecs0.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias("rep"),
            "vec_id",
            "qvec",
        )
        .select(
            (F.col("vec_id") * args.mult + F.col("rep")).alias("vec_id"),
            F.transform(
                "qvec", lambda x: x + F.col("rep") % 7
            ).alias("qvec"),
        )
        .repartition(64)
        .localCheckpoint(True)
    )
    n_vecs = big.count()

    t0 = time.time()
    books = sim.pq_fit(vecs0, m=4, k=8, iters=2, dim=64)
    fit_s = round(time.time() - t0, 2)
    t0 = time.time()
    queries = big.where(F.col("vec_id") % (100 * args.mult) == 0)
    n_top = sim.ann_pq_topk(big, queries, books, k=5, dim=64).count()
    out.append(
        {
            "op": "pq_ann",
            "mult": args.mult,
            "n_vecs": n_vecs,
            "fit_s": fit_s,
            "n_topk_rows": n_top,
            "scan_s": round(time.time() - t0, 2),
        }
    )

    # --- PageRank on a hand-off graph derived from inflated events
    ev = spark.read.parquet(f"{args.sf}/events.parquet")
    from pyspark.sql import Window

    big_ev = ev.select(
        F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias("rep"),
        "event_id",
        "user_id",
        "event_type",
        "ts",
    ).select(
        (F.col("event_id") * args.mult + F.col("rep")).alias("event_id"),
        (F.col("user_id") * args.mult + F.col("rep")).alias("user_id"),
        "event_type",
        "ts",
    ).repartition(64)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = big_ev.select("user_id", F.lead("user_id").over(w).alias("nxt"))
    edges = (
        seq.where(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("user_id")))
        .groupBy(F.col("user_id").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(True)
    )
    n_edges = edges.count()
    t0 = time.time()
    n_nodes = gr.pagerank(edges, iters=3).count()
    out.append(
        {
            "op": "pagerank_3it",
            "mult": args.mult,
            "n_edges": n_edges,
            "n_nodes": n_nodes,
            "wall_s": round(time.time() - t0, 2),
        }
    )

    for rec in out:
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
