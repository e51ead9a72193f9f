#!/usr/bin/env python
"""Training-data selection demo: the round-7 operators composed the
way a data-curation team would actually run them.

    python examples/select_training_data.py [--sf /root/testdata/sf0.01]

1. DSIR          : importance weights against the English target slice
                   (hashed-bigram models, integer bit arithmetic)
2. Outlier prune : embedding centroid-distance verdicts per label
3. Leakage-safe split : near-dup components hashed 80/10/10 so
                   duplicate families never straddle train/val
4. Token budget  : largest-remainder per-source quotas, greedy fill
5. Manifest      : per (split, source) doc/token totals for the docs
                   that survive every gate

Prints compact summaries of each stage.
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

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark import queries as q
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="select_training_data")
    q.ensure_session_conf(spark)

    docs = spark.read.parquet(f"{args.sf}/documents.parquet")

    # 1. DSIR weights -----------------------------------------------
    from credit_card_etl_pipeline_spark.dataops import curate as cu

    dsir = cu.dsir_weights(docs, F.col("lang") == "en").cache()
    kept = dsir.where("avg_bits_milli > -150")
    print(
        f"[dsir]   scored={dsir.count()}  target-like={kept.count()} "
        f"(threshold -150 milli-bits)"
    )

    # 2. Embedding outlier prune ------------------------------------
    from credit_card_etl_pipeline_spark.dataops import similarity as sim

    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    vecs = emb.select(
        "vec_id",
        "label",
        sim.quantize(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("qvec"),
    )
    verdicts = sim.centroid_outlier_verdicts(vecs)
    n_out = verdicts.where("is_outlier").count()
    print(f"[prune]  vectors={verdicts.count()}  outliers={n_out}")

    # 3. Leakage-safe split (components over the doc corpus) --------
    split = q.QUERIES["documents_leakage_safe_split"](spark, args.sf)
    sizes = {
        r["split"]: r["n"]
        for r in split.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"[split]  {sizes} (near-dup families co-assigned)")

    # 4. Token-budget fill ------------------------------------------
    fill = q.QUERIES["corpus_token_budget_fill"](spark, args.sf).cache()
    sel = fill.where("selected")
    print(
        "[budget] selected "
        f"{sel.count()}/{fill.count()} docs, "
        f"{sel.agg(F.sum('n_tokens')).collect()[0][0]} tokens "
        "(largest-remainder per-source quotas)"
    )

    # 5. Final manifest: every gate together ------------------------
    survivors = (
        kept.select("doc_id")
        .join(
            verdicts.where("NOT is_outlier").select(
                F.col("vec_id").alias("doc_id")
            ),
            "doc_id",
        )
        .join(split.where("component = doc_id"), "doc_id")
        .join(sel.select("doc_id", "source", "n_tokens"), "doc_id")
    )
    print("[manifest] per (split, source) survivors:")
    for r in (
        survivors.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .orderBy("split", "source")
        .collect()[:12]
    ):
        print(f"    {r['split']:5s} {r['source']:6s} docs={r['docs']:4d} tokens={r['tokens']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
