#!/usr/bin/env python
"""Scale soak for the round-7 operators: DSIR importance weights,
binary-Hamming ANN, centroid outlier pruning, and the leakage-safe
split's map-only tail (components are soaked separately in
tools/soak_components.py).

    python tools/soak_r7ops.py [--mult 30] [--sf /root/testdata/sf0.1]

Prints one JSON line per op with row counts and wall seconds; run at
two mults to read the scaling slope.
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
    from credit_card_etl_pipeline_spark.dataops import similarity as sim
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak_r7ops")
    out = []

    # --- DSIR on an inflated documents table: replicas perturb the text
    # so the hashed-gram models see real dispersion, lang rides along as
    # the target predicate.
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    fact = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias("rep"),
            "doc_id",
            "text",
            "lang",
        )
        .select(
            (F.col("doc_id") * args.mult + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") % 3 == 0, F.col("text"))
            .otherwise(
                F.concat(
                    F.lit("v"), F.col("rep").cast("string"),
                    F.lit(" "), F.col("text"),
                )
            )
            .alias("text"),
            "lang",
        )
        .repartition(64)
        .localCheckpoint(True)
    )
    n_docs = fact.count()

    t0 = time.time()
    n_scored = cu.dsir_weights(fact, F.col("lang") == "en").count()
    out.append(
        {
            "op": "dsir_weights",
            "mult": args.mult,
            "docs": n_docs,
            "scored": n_scored,
            "sec": round(time.time() - t0, 2),
        }
    )
    print(json.dumps(out[-1]), flush=True)

    # --- binary-Hamming ANN on an inflated embeddings table: replicas
    # jitter one dimension per rep so sign words differ across copies.
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    vecs = (
        emb.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias("rep"),
            "vec_id",
            "embedding",
            "label",
        )
        .select(
            (F.col("vec_id") * args.mult + F.col("rep")).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: x.cast("double")
                + F.when(
                    i == F.col("rep") % 64,
                    (F.col("rep") % 7).cast("double") / 10.0 - 0.3,
                ).otherwise(F.lit(0.0)),
            ).alias("embedding"),
            "label",
        )
        .repartition(64)
        .localCheckpoint(True)
    )
    n_vecs = vecs.count()
    qvecs = vecs.select(
        "vec_id", "label", sim.quantize(F.col("embedding")).alias("qvec")
    ).localCheckpoint(True)

    t0 = time.time()
    n_ann = sim.ann_hamming_topk(
        qvecs, qvecs.where(F.col("vec_id") % (100 * args.mult) == 0), k=5
    ).count()
    out.append(
        {
            "op": "ann_hamming_topk",
            "mult": args.mult,
            "vectors": n_vecs,
            "result_rows": n_ann,
            "sec": round(time.time() - t0, 2),
        }
    )
    print(json.dumps(out[-1]), flush=True)

    # --- centroid outlier pruning over the same inflated vectors
    t0 = time.time()
    verdicts = sim.centroid_outlier_verdicts(qvecs)
    n_out = verdicts.where("is_outlier").count()
    out.append(
        {
            "op": "centroid_outlier_verdicts",
            "mult": args.mult,
            "vectors": n_vecs,
            "outliers": n_out,
            "sec": round(time.time() - t0, 2),
        }
    )
    print(json.dumps(out[-1]), flush=True)

    # --- corpus drift between two halves of the inflated corpus
    ref = fact.where(F.col("doc_id") % 2 == 0).select("text")
    new = fact.where(F.col("doc_id") % 2 == 1).select("text")
    t0 = time.time()
    drows = cu.gram_distribution_drift(ref, new).count()
    out.append(
        {
            "op": "gram_distribution_drift",
            "mult": args.mult,
            "docs": n_docs,
            "buckets": drows,
            "sec": round(time.time() - t0, 2),
        }
    )
    print(json.dumps(out[-1]), flush=True)

    # --- persisted IVF index build + incremental probe (index write
    # is part of the build cost; the probe is the serving-path cost)
    import tempfile

    k = max(8, n_vecs // 1000)
    cents = sim.ivf_fit(qvecs, k=k, iters=2)
    path = tempfile.mkdtemp(prefix="soak_ivf_") + "/index"
    t0 = time.time()
    qvecs.withColumn(
        "cell", sim.assign_cluster(F.col("qvec"), cents)
    ).write.mode("overwrite").partitionBy("cell").parquet(path)
    build_s = round(time.time() - t0, 2)
    idx = spark.read.parquet(path)
    batch = qvecs.where(F.col("vec_id") % 199 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "qvec"
    )
    t0 = time.time()
    n_hits = sim.ivf_probe_index(idx, batch, cents, k=5, nprobe=2).count()
    out.append(
        {
            "op": "ivf_persisted_probe",
            "mult": args.mult,
            "vectors": n_vecs,
            "k": k,
            "build_sec": build_s,
            "probe_rows": n_hits,
            "probe_sec": round(time.time() - t0, 2),
        }
    )
    print(json.dumps(out[-1]), flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
