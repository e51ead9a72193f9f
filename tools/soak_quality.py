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
* DISCRIMINATIVE gate (VERDICT r10 ask #1): the planted-dup recall
  above is near-vacuous on this corpus (extra_flag_rate ~0.90 — a
  flag-everything policy would also score recall 1.0), so a second
  corpus is built with PLANTED NEGATIVES: random unit vectors whose
  max quantized cosine against the entire corpus (and each other) is
  MEASURED and required to sit ≥ NEG_MARGIN below the 0.999 verdict
  threshold.  Both strategies must (a) keep dup-recall 1.0, (b) flag
  ZERO negatives, and (c) score EXACT precision 1.0 and report exact
  global recall against the full brute-force ground truth (every
  within-0.999 lower-id pair, computed independently in numpy over
  the same quantized vectors — exact integer dots in float64, bit-
  identical cosine ops).  An over-merging regression — loosened
  threshold, broken norms, degenerate leaf assignment — now fails
  the gate where the old corpus could not catch it.
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


#: negatives are only planted if their measured max cosine vs the
#: whole corpus sits at least this far below the 0.999 dup threshold
NEG_MARGIN = 0.049
N_NEGATIVES = 200


def _engine_quantized_corpus(spark, sf_dir):
    """The EXACT vector set the semantic-dedup queries score: base
    embeddings + the % 10 == 0 clones at id+1M, quantized through the
    engine's own sim.quantize expression (collecting engine-quantized
    ints sidesteps any round-half numpy/JVM drift)."""
    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.dataops import similarity as sim
    from credit_card_etl_pipeline_spark.queries import load

    emb = load(spark, sf_dir, "embeddings")
    dups = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    allv = emb.select("vec_id", "embedding").unionByName(dups).select(
        "vec_id",
        sim.quantize(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("qvec"),
    )
    pdf = allv.toPandas().sort_values("vec_id").reset_index(drop=True)
    import numpy as np

    ids = pdf["vec_id"].to_numpy()
    q = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["qvec"]])
    # quantized components are small ints; float64 dots of them are
    # EXACT (max |dot| << 2^53), so matmul below reproduces the
    # engine's integer dot bit-for-bit
    return ids, q


def _global_dup_truth(ids, q, threshold=0.999, block=1024):
    """Exact brute-force ground truth: for every vector, does ANY
    lower-id vector sit at quantized cosine >= threshold?  Blocked
    float64 matmul; cosine = dot / sqrt(n2a*n2b) — the identical IEEE
    op sequence the engine and oracle use (dot exact, one multiply,
    one sqrt, one divide), so verdicts are bit-comparable."""
    import numpy as np

    n = len(ids)
    order = np.argsort(ids, kind="stable")
    qs = q[order]
    n2 = np.einsum("ij,ij->i", qs, qs)
    truth_sorted = np.zeros(n, dtype=bool)
    max_cos_sorted = np.full(n, -2.0)
    for s in range(1, n, block):
        e = min(s + block, n)
        dots = qs[s:e] @ qs[:e].T                      # (b, e)
        denom = np.sqrt(np.outer(n2[s:e], n2[:e]))
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = dots / denom
        # strictly lower sorted position == strictly lower id
        cols = np.arange(e)
        mask = cols[None, :] < np.arange(s, e)[:, None]
        cos = np.where(mask, cos, -2.0)
        truth_sorted[s:e] = (cos >= threshold).any(axis=1)
        max_cos_sorted[s:e] = cos.max(axis=1)
    truth = np.zeros(n, dtype=bool)
    max_cos = np.empty(n)
    truth[order] = truth_sorted
    max_cos[order] = max_cos_sorted
    return truth, max_cos


def _build_negprobe_corpus(spark, sf_dir, out_dir, seed=1101):
    """Write ``out_dir``/embeddings.parquet = the sf corpus plus
    N_NEGATIVES random unit vectors at vec_id 5_000_000+10i+7 (% 10
    != 0, so the queries never clone them).  Returns the negative
    ids.  The margin is MEASURED afterwards in engine space — this
    builder only has to propose plausible candidates."""
    import numpy as np

    from credit_card_etl_pipeline_spark.queries import load

    rng = np.random.default_rng(seed)
    cand = rng.standard_normal((N_NEGATIVES, 64))
    cand /= np.linalg.norm(cand, axis=1, keepdims=True)
    cand *= 0.5  # component scale ~0.06: quantizes to ~60-int grid
    neg_ids = [5_000_000 + 10 * i + 7 for i in range(N_NEGATIVES)]
    neg_rows = [
        (int(i), [float(x) for x in v]) for i, v in zip(neg_ids, cand)
    ]
    neg_df = spark.createDataFrame(
        neg_rows, "vec_id long, embedding array<float>"
    )
    base = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = os.path.join(out_dir, "embeddings.parquet")
    base.unionByName(neg_df).coalesce(4).write.mode("overwrite").parquet(out)
    return neg_ids


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

    # -------- discriminative gate: planted negatives + exact labels --
    import numpy as np

    negp_dir = os.path.join(os.path.dirname(args.sf.rstrip("/")) or ".",
                            os.path.basename(args.sf.rstrip("/")) + "negp")
    neg_ids = _build_negprobe_corpus(spark, args.sf, negp_dir)
    neg_set = set(neg_ids)
    ids, qmat = _engine_quantized_corpus(spark, negp_dir)
    t0 = time.time()
    truth, max_cos = _global_dup_truth(ids, qmat)
    truth_wall = round(time.time() - t0, 1)
    is_neg = np.isin(ids, neg_ids)
    neg_margin = float(0.999 - max_cos[is_neg].max())
    # the injected exact clones live at +1M; negatives at 5M+ are NOT
    # planted dups and must stay out of the recall denominator
    planted_mask = (ids >= 1_000_000) & ~is_neg
    report["negprobe"] = {
        "corpus_dir": negp_dir,
        "n_vectors": int(len(ids)),
        "n_negatives": len(neg_ids),
        "neg_measured_max_cos": round(float(max_cos[is_neg].max()), 4),
        "neg_margin_below_threshold": round(neg_margin, 4),
        "margin_required": NEG_MARGIN,
        "n_true_global_dups": int(truth.sum()),
        "truth_wall_s": truth_wall,
    }
    margin_ok = neg_margin >= NEG_MARGIN
    # negatives must not even be true dups (they are, by margin)
    assert not truth[is_neg].any()

    id_pos = {int(v): i for i, v in enumerate(ids)}
    strat_ok = True
    for label, fn in (
        ("two_level", dq.dedup_semantic_two_level),
        ("flat", dq.dedup_semantic_clusters),
    ):
        t0 = time.time()
        rows = (
            fn(spark, negp_dir)
            .select("vec_id", "is_semantic_dup")
            .collect()
        )
        flagged = np.zeros(len(ids), dtype=bool)
        for r in rows:
            flagged[id_pos[int(r["vec_id"])]] = bool(r["is_semantic_dup"])
        tp = int((flagged & truth).sum())
        fp = int((flagged & ~truth).sum())
        fn_ = int((~flagged & truth).sum())
        neg_flagged = int(flagged[is_neg].sum())
        planted_recall = float(
            flagged[planted_mask].sum() / max(planted_mask.sum(), 1)
        )
        entry = {
            "n_flagged": int(flagged.sum()),
            "neg_flagged": neg_flagged,
            "neg_flag_rate": round(neg_flagged / max(len(neg_ids), 1), 4),
            # EXACT labels (full brute-force ground truth, not a
            # sample): every flag must be a real quantized-cosine
            # >= 0.999 lower-id pair somewhere in the corpus
            "precision_exact": round(tp / max(tp + fp, 1), 6),
            "false_positives": fp,
            # global recall is informational: the engine only pairs
            # within leaves, so cross-leaf true dups are the
            # approximation loss — record it, don't pretend it's 1.0
            "global_recall_exact": round(tp / max(tp + fn_, 1), 6),
            "false_negatives": fn_,
            "planted_dup_recall": round(planted_recall, 4),
            "wall_s": round(time.time() - t0, 1),
        }
        report[f"negprobe_{label}"] = entry
        print(json.dumps({f"negprobe_{label}": entry}), flush=True)
        strat_ok = strat_ok and (
            neg_flagged == 0
            and entry["precision_exact"] == 1.0
            and planted_recall == 1.0
        )

    ok = (
        report["ann"]["auto_ge_fixed"]
        and report["dedup_semantic_two_level"]["dup_recall"] == 1.0
        and report["dedup_semantic_flat"]["dup_recall"] == 1.0
        and margin_ok
        and strat_ok
    )
    report["pass"] = ok
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"{'PASS' if ok else 'FAIL'}  quality soak -> {args.out}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
