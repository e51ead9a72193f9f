#!/usr/bin/env python
"""Scale soak for the multimodal fingerprint family and the v4
curation composition.

    python tools/soak_r7fp.py [--mult 10] [--sf /root/testdata/sf0.1]

* image dHash: synthetic ids -> real PNG encode/decode + hash (the
  map-only pass) then banded Hamming matching — timed separately so
  the linear codec pass and the blocking join are visible apart.
* curation v4 composition: DSIR gate + LSH components + outlier
  verdicts + split over an inflated corpus (the query body against
  mult-times the bench tables).

One JSON line per op.
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
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak_r7fp")

    # ---------- image dHash fingerprints over synthetic ids ----------
    from collections.abc import Iterator

    import pandas as pd

    from credit_card_etl_pipeline_spark.dataops import multimodal as mm
    from credit_card_etl_pipeline_spark.dataops import png as pngc

    n_imgs = 500 * args.mult

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, words, bidx, bval = [], [], [], []
            for doc_id in pdf["id"]:
                i64 = int(doc_id)
                g = i64 // 50
                pixels = bytearray(
                    (g * 31 + i * (7 + g % 13)) % 256 for i in range(288)
                )
                enc = pngc.encode_png(18, 16, 1, bytes(pixels))
                w, h, gray = mm.decode_image_gray(enc)
                word, bands = mm.dhash64(w, h, gray)
                for j, bv in enumerate(bands):
                    ids.append(i64)
                    words.append(word)
                    bidx.append(j)
                    bval.append(bv)
            yield pd.DataFrame(
                {"doc_id": ids, "word": words, "band_idx": bidx,
                 "band_val": bval}
            )

    ids = spark.range(n_imgs).repartition(64)
    t0 = time.time()
    feats = ids.mapInPandas(
        run, "doc_id long, word long, band_idx long, band_val long"
    ).localCheckpoint(True)
    n_feat = feats.count()
    hash_s = round(time.time() - t0, 2)

    left = feats.select(
        F.col("doc_id").alias("doc_a"), F.col("word").alias("wa"),
        "band_idx", "band_val",
    )
    right = feats.select(
        F.col("doc_id").alias("doc_b"), F.col("word").alias("wb"),
        "band_idx", "band_val",
    )
    t0 = time.time()
    n_pairs = (
        left.join(right, ["band_idx", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "wa", "wb")
        .distinct()
        .where(F.bit_count(F.col("wa").bitwiseXOR(F.col("wb"))) <= 6)
        .count()
    )
    match_s = round(time.time() - t0, 2)
    print(json.dumps({
        "op": "image_dhash", "mult": args.mult, "images": n_imgs,
        "hash_rows": n_feat, "hash_sec": hash_s,
        "pairs": n_pairs, "match_sec": match_s,
    }), flush=True)

    # ---------- curation v4 composition over inflated tables ----------
    from credit_card_etl_pipeline_spark.dataops import curate as cu
    from credit_card_etl_pipeline_spark.dataops import dedup as dd
    from credit_card_etl_pipeline_spark.dataops import similarity as sim
    from credit_card_etl_pipeline_spark.functions.hashing import md5_int60

    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    base = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias("rep"),
            "doc_id", "text", "lang",
        )
        .select(
            (F.col("doc_id") * args.mult + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") % 3 == 0, F.col("text"))
            .otherwise(F.concat(F.lit("v"), F.col("rep").cast("string"),
                                F.lit(" "), F.col("text"))).alias("text"),
            "lang",
        )
        .repartition(64)
        .localCheckpoint(True)
    )
    n_docs = base.count()

    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    evecs = (
        emb.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias("rep"),
            "vec_id", "embedding", "label",
        )
        .select(
            (F.col("vec_id") * args.mult + F.col("rep")).alias("vec_id"),
            "label",
            sim.quantize(
                F.transform(F.col("embedding"), lambda x: x.cast("double"))
            ).alias("qvec"),
        )
        .repartition(64)
        .localCheckpoint(True)
    )

    t0 = time.time()
    dsir = cu.dsir_weights(base, F.col("lang") == "en").select(
        "doc_id", "avg_bits_milli"
    )
    sh = dd.exploded_shingles(base)
    sig = dd.minhash_signatures(sh)
    pairs = dd.lsh_candidate_pairs(sig, bands=2, rows=4,
                                   max_bucket_size=1000)
    comps = dd.connected_components(base.select("doc_id"), pairs)
    outv = sim.centroid_outlier_verdicts(evecs).select(
        F.col("vec_id").alias("doc_id"), "is_outlier"
    )
    h = md5_int60(F.col("component").cast("string")) % 10
    avg = F.coalesce(F.col("avg_bits_milli"), F.lit(-1_000_000))
    out = (
        comps.join(dsir, "doc_id", "left")
        .join(outv, "doc_id", "left")
        .select(
            "doc_id",
            F.when(h < 8, "train").when(h == 8, "val").otherwise("test")
            .alias("split"),
            (avg > -150).alias("dsir_ok"),
            (F.col("component") != F.col("doc_id")).alias("is_dup"),
        )
    )
    n_out = out.count()
    n_keep = out.where("dsir_ok AND NOT is_dup").count()
    print(json.dumps({
        "op": "curation_v4_composition", "mult": args.mult,
        "docs": n_docs, "verdicts": n_out, "keeps": n_keep,
        "sec": round(time.time() - t0, 2),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
