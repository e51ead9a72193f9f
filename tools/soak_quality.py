#!/usr/bin/env python
"""Quality-at-scale soak for the self-tuning semantic/ANN family
(VERDICT r9 ask #6): hash parity proves the engine computes what the
oracle computes, but the SELF-TUNING LAWS (k = √n codebooks, nprobe =
√k, the 3M flat→two_level flip) are justified by RECALL — so re-measure
recall on planted ground truth at sf1 each round and pin the numbers
next to the flip constants.

    python tools/soak_quality.py [--sf .scale/sf1] [--out SOAK_QUALITY.json]

Measures:

* ``ann_ivf_auto_k``    — recall@5 vs the exact brute-force cosine
  top-5 over the same probe set, alongside the fixed-k ``ann_ivf_topk``
  baseline the auto law must not fall below.
* ``dedup_semantic_two_level`` — recall on the planted exact-duplicate
  pairs (every vec_id % 10 == 0 vector is cloned at id+1M; identical
  vectors must land in the same leaf and be flagged), plus the extra-
  flag rate (non-planted flags — legitimate near-dups, recorded so a
  sudden jump is visible).
* flat vs two_level verdict agreement at sf1 — both strategies run at
  a size where both are tractable; the auto selector's premise is that
  the verdict surface is interchangeable across the flip, so measure
  the actual agreement rate instead of assuming it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def recall_vs_exact(spark, approx_df, exact_df) -> dict:
    """Mean recall@5: |approx ∩ exact| / |exact| per query, averaged."""
    from pyspark.sql import functions as F

    a = approx_df.select("query_id", "cand_id").withColumn(
        "__hit", F.lit(1)
    )
    row = (
        exact_df.select("query_id", "cand_id")
        .join(a, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg((F.count("__hit") / F.count(F.lit(1))).alias("r"))
        .agg(
            F.avg("r").alias("recall"),
            F.count(F.lit(1)).alias("n_queries"),
        )
        .first()
    )
    return {
        "recall_at_5": round(float(row["recall"]), 4),
        "n_queries": int(row["n_queries"]),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scale/sf1")
    ap.add_argument("--out", default="SOAK_QUALITY.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.dataops import similarity as sim
    from credit_card_etl_pipeline_spark.queries import dataops_queries as dq
    from credit_card_etl_pipeline_spark.queries import load
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak_quality")
    report: dict = {"sf_dir": args.sf}

    # ---------------- ANN recall: auto-k law vs fixed-k baseline ----
    vecs = dq._quantized(spark, args.sf).persist()
    n = vecs.count()
    queries = vecs.where(F.col("vec_id") % 100 == 0).persist()
    t0 = time.time()
    exact = (
        sim.cosine_topk(vecs, queries, k=5)
        .select("query_id", "cand_id")
        .persist()
    )
    n_exact = exact.count()
    exact_wall = round(time.time() - t0, 1)

    k_auto = sim.ivf_auto_k(n, floor_k=dq._IVF_K)
    nprobe_auto = sim.ivf_auto_nprobe(k_auto)
    runs = {}
    for label, fn in (
        ("ann_ivf_auto_k", dq.ann_ivf_auto_k),
        ("ann_ivf_topk", dq.ann_ivf_topk),
    ):
        t0 = time.time()
        rec = recall_vs_exact(spark, fn(spark, args.sf), exact)
        rec["wall_s"] = round(time.time() - t0, 1)
        runs[label] = rec
        print(json.dumps({label: rec}), flush=True)
    report["ann"] = {
        "n_vectors": n,
        "auto_k": k_auto,
        "auto_nprobe": nprobe_auto,
        "fixed_k": dq._IVF_K,
        "fixed_nprobe": dq._IVF_NPROBE,
        "exact_pairs": n_exact,
        "exact_wall_s": exact_wall,
        **runs,
        "auto_ge_fixed": runs["ann_ivf_auto_k"]["recall_at_5"]
        >= runs["ann_ivf_topk"]["recall_at_5"],
    }
    exact.unpersist()
    queries.unpersist()
    vecs.unpersist()

    # ------------- semantic dedup: planted-duplicate recall ---------
    emb_n = load(spark, args.sf, "embeddings").count()
    planted = (
        load(spark, args.sf, "embeddings")
        .where(F.col("vec_id") % 10 == 0)
        .count()
    )
    verdicts = {}
    for label, fn in (
        ("two_level", dq.dedup_semantic_two_level),
        ("flat", dq.dedup_semantic_clusters),
    ):
        t0 = time.time()
        out = fn(spark, args.sf).select("vec_id", "is_semantic_dup").persist()
        flagged_planted = out.where(
            (F.col("vec_id") >= 1_000_000) & F.col("is_semantic_dup")
        ).count()
        flagged_other = out.where(
            (F.col("vec_id") < 1_000_000) & F.col("is_semantic_dup")
        ).count()
        verdicts[label] = out
        report[f"dedup_semantic_{label}"] = {
            "n_base": emb_n,
            "planted_dups": planted,
            "flagged_planted": flagged_planted,
            "dup_recall": round(flagged_planted / max(planted, 1), 4),
            "flagged_non_planted": flagged_other,
            "extra_flag_rate": round(flagged_other / max(emb_n, 1), 4),
            "wall_s": round(time.time() - t0, 1),
        }
        print(
            json.dumps({label: report[f"dedup_semantic_{label}"]}),
            flush=True,
        )

    # ------------- flip premise: verdict agreement across strategies
    both = verdicts["two_level"].alias("t").join(
        verdicts["flat"]
        .withColumnRenamed("is_semantic_dup", "flat_dup")
        .alias("f"),
        "vec_id",
    )
    total = both.count()
    agree = both.where(
        F.col("is_semantic_dup") == F.col("flat_dup")
    ).count()
    report["flip_verdict_agreement"] = {
        "n": total,
        "agree": agree,
        "rate": round(agree / max(total, 1), 4),
        "flip_at": sim.SEMANTIC_FLIP_AT,
    }
    print(json.dumps({"flip": report["flip_verdict_agreement"]}), flush=True)
    for v in verdicts.values():
        v.unpersist()

    ok = (
        report["ann"]["auto_ge_fixed"]
        and report["dedup_semantic_two_level"]["dup_recall"] == 1.0
        and report["dedup_semantic_flat"]["dup_recall"] == 1.0
    )
    report["pass"] = ok
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"{'PASS' if ok else 'FAIL'}  quality soak -> {args.out}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
