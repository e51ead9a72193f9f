#!/usr/bin/env python
"""Scale soak for connected components + canonical-doc selection — the
two heaviest non-streaming stages of the dedup pipeline.

Synthesizes component graphs far past bench scale in two shapes:

* ``star``  — clusters of size 10 with all edges to a hub: the shallow
  (diameter-2) topology LSH near-dup buckets actually produce; label
  propagation should converge in ~2 rounds regardless of corpus size.
* ``chain`` — paths of length 16 (diameter 15): the ADVERSARIAL case
  for min-label propagation, one hop per round — worst-case rounds ≈
  chain length, bounded by ``max_iters``.

    python tools/soak_components.py [--sizes 1000000,3000000,10000000]

Prints one JSON line per (shape, n): wall seconds for the component
fixpoint, rounds taken, component-count correctness, and the
canonical-selection pass over the produced labels.
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
    ap.add_argument("--sizes", default="1000000,3000000,10000000")
    ap.add_argument("--chain-len", type=int, default=16)
    ap.add_argument("--star-size", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.dataops import dedup
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak_components")

    # rounds-to-fixpoint is the graph diameter by construction:
    # star = 2 (+1 detection round), chain = chain_len - 1 (+1)

    def graph(shape: str, n: int):
        v = spark.range(n).select(F.col("id").alias("doc_id"))
        if shape == "star":
            k = args.star_size
            e = (
                spark.range(n)
                .where(F.col("id") % k != 0)
                .select(
                    (F.col("id") - F.col("id") % k).alias("doc_a"),
                    F.col("id").alias("doc_b"),
                )
            )
            want = n // k  # one component per hub
        else:  # chain
            k = args.chain_len
            e = (
                spark.range(n)
                .where(F.col("id") % k != k - 1)
                .select(
                    F.col("id").alias("doc_a"),
                    (F.col("id") + 1).alias("doc_b"),
                )
            )
            want = n // k
        return v, e, want

    results = []
    for shape in ("star", "chain"):
        for n in [int(s) for s in args.sizes.split(",")]:
            v, e, want = graph(shape, n)
            t0 = time.perf_counter()
            labels = dedup.connected_components(
                v, e, max_iters=args.chain_len + 4
            )
            # fixpoint already materialized inside (out.count())
            wall_cc = time.perf_counter() - t0
            n_comp = labels.select("component").distinct().count()

            # canonical selection over the produced labels with a
            # deterministic integer quality
            quality = spark.range(n).select(
                F.col("id").alias("doc_id"),
                (F.xxhash64(F.col("id")) % 1000).alias("q"),
            )
            t0 = time.perf_counter()
            kept = dedup.canonical_per_component(labels, quality)
            n_kept = kept.count()
            wall_canon = time.perf_counter() - t0
            labels.unpersist()

            row = {
                "shape": shape,
                "n_vertices": n,
                "wall_components_s": round(wall_cc, 2),
                "n_components": n_comp,
                "components_correct": n_comp == want,
                "wall_canonical_s": round(wall_canon, 2),
                "n_kept": n_kept,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    bad = [r for r in results if not r["components_correct"]]
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
