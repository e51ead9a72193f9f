#!/usr/bin/env python
"""Training-data curation demo: raw document corpus → packed sequences.

    python examples/curate_corpus.py [--sf /root/testdata/sf0.01] \
        [--out /tmp/curated]

The pipeline every LLM data team runs between crawl and tokenizer, as
ONE lazy Spark plan per stage over the ``documents`` table:

1. dedup        : exact (md5 groups) + MinHash/LSH near-dup candidates
                  (hot-bucket-capped) + Jaccard verification
2. quality      : Gopher-style per-rule flags → keep verdict
3. decontaminate: drop docs sharing 3-gram shingles with a held-out
                  benchmark slice (broadcast shingle set)
4. scrub        : PII masking (map-only JVM regexes)
5. mix          : deterministic epoch weighting per language
6. pack         : distributed two-pass prefix sum → 512-token sequences

Prints per-stage row counts and writes the packed manifest as parquet.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/curated")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.dataops import curate as cu
    from credit_card_etl_pipeline_spark.dataops import dedup as dd
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="curate_corpus")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    print(f"raw docs:          {docs.count()}")

    # 1. dedup: exact survivors, then LSH candidates verified by Jaccard
    deduped = dd.dedup_exact(docs)
    sigs = dd.minhash_signatures(dd.exploded_shingles(deduped))
    cands = dd.lsh_candidate_pairs(sigs)  # capped library default
    verified = dd.jaccard_for_pairs(
        dd.exploded_shingles(deduped), cands
    ).where(F.col("jaccard") >= 0.8)
    near_dupe_ids = verified.select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    deduped = deduped.join(near_dupe_ids, "doc_id", "left_anti")
    print(f"after dedup:       {deduped.count()}")

    # 1b. span-level exact-substring dedup (Lee et al. 2022): drop docs
    # whose MERGED duplicated 8-token runs cover >= half their tokens —
    # catches boilerplate-heavy pages whole-doc methods miss
    from credit_card_etl_pipeline_spark.dataops.text import n_tokens

    dup_toks = dd.duplicate_spans(deduped, k=8).groupBy("doc_id").agg(
        F.sum("span_tokens").alias("dup_toks")
    )
    lens = deduped.select("doc_id", n_tokens(F.col("text")).alias("n_toks"))
    boiler = (
        dup_toks.join(lens, "doc_id")
        .where(F.col("dup_toks") * 2 >= F.col("n_toks"))
        .select("doc_id")
    )
    deduped = deduped.join(boiler, "doc_id", "left_anti")
    print(f"after span dedup:  {deduped.count()}")

    # 2. quality gate (reuse the registered verdict expressions)
    # project the token array once — four references below (the
    # library's single-split projection rule, SCALE.md)
    from credit_card_etl_pipeline_spark.dataops.text import words

    w = F.col("__toks")
    keep = (
        (F.size(w) >= 10)
        & ((F.size(w) - F.size(F.array_distinct(w))) / F.size(w) <= 0.6)
    )
    quality = (
        deduped.withColumn("__toks", words(F.col("text")))
        .where(keep)
        .drop("__toks")
    )
    print(f"after quality:     {quality.count()}")

    # 3. decontaminate against the held-out slice
    bench = docs.where(F.col("doc_id") % 50 == 0)
    overlap = cu.benchmark_overlap(quality, bench)
    clean = quality.join(
        overlap.where(F.col("n_shared") > 0).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    print(f"after decontam:    {clean.count()}")

    # 4. PII scrub + 5. mix + 6. pack
    scrubbed = clean.withColumn("text", cu.pii_scrub(F.col("text")))
    mixture = cu.weighted_mix(scrubbed, {"en": 20000, "zh": 5000})
    print(f"mixture rows:      {mixture.count()}")

    packed = cu.pack_sequences(
        mixture.select(
            (F.col("doc_id") * 10 + F.col("epoch")).alias("pack_id"), "text"
        ),
        id_col="pack_id",
        seq_tokens=512,
    )
    total = packed.agg(
        F.max(F.col("start_tok") + F.col("n_tokens")).alias("t")
    ).first()["t"]
    n_seqs = (total + 511) // 512
    print(f"packed docs:       {packed.count()}")
    print(f"total tokens:      {total}  ({n_seqs} sequences of 512)")

    out = os.path.join(args.out, "packed_manifest")
    packed.write.mode("overwrite").parquet(out)
    print(f"manifest:          {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
