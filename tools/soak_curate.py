#!/usr/bin/env python
"""Scale soak for the curation/dedup ops: inflate the documents corpus
``mult``× with IDENTICAL texts per replica group — the pathological
hot-bucket corpus (boilerplate pages) where uncapped LSH banding emits
m²/2 pairs per bucket.  Measures:

* capped LSH candidate generation + overflow routing (the library
  default) — must stay bounded;
* exact dedup over the inflated corpus (the overflow route);
* distributed sequence packing (two-pass prefix sum) over every doc.

    python tools/soak_curate.py [--mult 40] [--sf /root/testdata/sf0.1]

Prints one JSON line.
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
    ap.add_argument("--mult", type=int, default=40)
    ap.add_argument("--hot-mult", type=int, default=4000)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.dataops import curate as cu
    from credit_card_etl_pipeline_spark.dataops import dedup as dd
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak_curate")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = docs.count()

    # mult exact copies of every document under distinct ids — every
    # text group an m-sized hot bucket in EVERY band — plus ~1% of docs
    # inflated hot_mult x: buckets far past the cap, whose uncapped
    # pairing would be hot_mult^2/2 pairs EACH (the blowup the default
    # cap exists to stop).
    reps = (
        F.when(F.col("doc_id") % 97 == 0, F.lit(args.hot_mult))
        .otherwise(F.lit(args.mult))
    )
    corpus = docs.select(
        F.explode(F.sequence(F.lit(0), reps - 1)).alias("rep"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * args.hot_mult + F.col("rep")).alias("doc_id"),
        "text",
    ).repartition(spark.sparkContext.defaultParallelism)
    n_hot = docs.where(F.col("doc_id") % 97 == 0).count()
    out_rows = (n_base - n_hot) * args.mult + n_hot * args.hot_mult

    out: dict[str, object] = {
        "metric": "soak_curate",
        "unit": "sec",
        "mult": args.mult,
        "hot_mult": args.hot_mult,
        "hot_texts": n_hot,
        "corpus_rows": out_rows,
    }

    t0 = time.perf_counter()
    sigs = dd.minhash_signatures(dd.exploded_shingles(corpus)).persist()
    cands = dd.lsh_candidate_pairs(sigs)  # capped library default
    out["lsh_capped_pairs"] = cands.count()
    out["lsh_capped_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    overflow = dd.lsh_overflow_docs(sigs)
    out["lsh_overflow_docs"] = overflow.count()
    out["lsh_overflow_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    groups = dd.exact_dup_groups(corpus).where(F.col("n_copies") > 1)
    out["exact_dup_groups"] = groups.count()
    out["exact_dedup_sec"] = round(time.perf_counter() - t0, 2)

    sigs.unpersist()

    t0 = time.perf_counter()
    packed = cu.pack_sequences(corpus)
    out["packed_docs"] = packed.count()
    total = packed.agg(
        F.max(F.col("start_tok") + F.col("n_tokens")).alias("t")
    ).first()["t"]
    out["packed_total_tokens"] = total
    out["pack_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
