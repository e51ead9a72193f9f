#!/usr/bin/env python
"""Scale soak for the round-5 operators: incremental LSH probe and
Bloom-filter probing, each on a corpus inflated far past bench scale.

    python tools/soak_r5ops.py [--mult 30] [--sf /root/testdata/sf0.1]

mult=30 over sf0.1 documents ≈ 150k docs (5k batch against a 145k
corpus for the probe; 150k keys probed against a one-segment filter
for Bloom).  Prints one JSON line per op with row counts and wall
seconds.
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

    from credit_card_etl_pipeline_spark.dataops import dedup as dd
    from credit_card_etl_pipeline_spark.dataops import sketches as sk
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak_r5ops")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")

    # inflate: every doc becomes `mult` rows with distinct ids and a
    # per-replica word prefix so near-dup structure stays realistic
    # (replica 0 of every doc keeps the original text -> guaranteed
    # corpus hits for the batch replicas of every 10th doc)
    fact = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias("rep"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * args.mult + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(F.concat(F.lit("variant "), F.col("rep").cast("string"), F.lit(" "), F.col("text")))
        .alias("text"),
        F.col("rep"),
    )

    out = []

    # --- incremental LSH probe: 1/mult of the corpus as the new batch
    sigs = dd.minhash_signatures(dd.exploded_shingles(fact)).localCheckpoint(True)
    batch = sigs.join(fact.where(F.col("rep") == 1).select("doc_id"), "doc_id")
    corpus = sigs.join(fact.where(F.col("rep") != 1).select("doc_id"), "doc_id")
    t0 = time.perf_counter()
    pairs = dd.lsh_probe_pairs(batch, corpus)
    n_pairs = pairs.count()
    wall = round(time.perf_counter() - t0, 2)
    row = {"op": "lsh_probe_pairs", "mult": args.mult,
           "n_batch": batch.count(), "n_corpus": corpus.count(),
           "n_candidate_pairs": n_pairs, "wall_s": wall}
    out.append(row)
    print(json.dumps(row), flush=True)

    # --- Bloom: filter over one replica's texts, probe EVERY doc
    members = fact.where(F.col("rep") == 0).select(
        F.md5("text").alias("k")
    )
    # size the bit space to the member count (~26 bits/member keeps
    # the false-positive rate well under 1% at depth 4)
    m_bits = 1 << max(10, (members.count() * 26).bit_length())
    t0 = time.perf_counter()
    bloom = sk.bloom_build(members, "k", m=m_bits)
    probes = fact.select("doc_id", F.md5("text").alias("k"))
    claimed = sk.bloom_probe(bloom, probes, "k", m=m_bits)
    n_claimed = claimed.where("bloom_member").count()
    wall = round(time.perf_counter() - t0, 2)
    row = {"op": "bloom_build_probe", "mult": args.mult,
           "m_bits": m_bits, "n_members": members.count(), "n_probes": probes.count(),
           "n_claimed": n_claimed, "wall_s": wall}
    out.append(row)
    print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
