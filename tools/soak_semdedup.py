#!/usr/bin/env python
"""Soak dedup_semantic_clusters (cluster-scoped embedding dedup) at
10x/30x the bench corpus.

Inflates sf0.1 embeddings into a temp sf-dir: copy c strides vec_id by
10_000 (stays below the query's own +1M dup-injection offset) and
SIGN-FLIPS a copy-dependent ~third of the dimensions, so different
copies of the same base vector sit far below the 0.999 cosine
threshold — distinct corpus members, not dups.  (The first version of
this soak perturbed ONE dimension by 0.01, which left every copy at
cosine ~0.9999 to every other copy: the corpus then genuinely
contained ~mult² true near-dup pairs and the soak measured that
manufactured explosion — 72% of verdicts dup at 30x — instead of the
operator.  Same lesson as the trailing-tag text-soak artifact: keep
the dup structure per-copy or the probe measures the corpus, not the
code.)  The query's own +1M injection still provides the 10% exact
dups per copy.

    python tools/soak_semdedup.py [mults...]   # default 10 30

One JSON line per mult: vectors, wall seconds, dup verdicts.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from credit_card_etl_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [10, 30]
    spark = get_spark(app_name="soak_semdedup")
    from credit_card_etl_pipeline_spark.queries import dataops_queries as dq

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    for mult in mults:
        out = tempfile.mkdtemp(prefix=f"soak_semdedup_x{mult}_")
        def _flip_fn(fl):
            # factory, not default args: pyspark sizes the lambda by
            # its full parameter count, so a fl=... default would make
            # it bind a third column over the closure
            if not fl:
                return lambda x, i: x
            return lambda x, i: F.when(i.isin(fl), -x).otherwise(x)

        parts = []
        for c in range(mult):
            # flip dims by the 5-bit pattern of c: any two copies
            # differ in >= ~13 flipped dims -> cosine ~0.6, far from
            # the 0.999 threshold (32 distinct patterns covers mults
            # up to 32; beyond that widen the mask)
            flips = [i for i in range(64) if (c >> (i % 5)) & 1]
            parts.append(
                emb.select(
                    (F.col("vec_id") + c * 10_000).alias("vec_id"),
                    F.transform("embedding", _flip_fn(flips)).alias(
                        "embedding"
                    ),
                    *[x for x in emb.columns
                      if x not in ("vec_id", "embedding")],
                )
            )
        inf = parts[0]
        for p in parts[1:]:
            inf = inf.unionByName(p)
        inf.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
        n = spark.read.parquet(f"{out}/embeddings.parquet").count()

        for qname, fn, cache in (
            (
                "flat_scaled_k",
                dq.dedup_semantic_clusters,
                dq._SEMDEDUP_CODEBOOK_CACHE,
            ),
            (
                "hierarchical",
                dq.dedup_semantic_hierarchical,
                dq._HIER_CODEBOOK_CACHE,
            ),
        ):
            cache.pop(out, None)
            t0 = time.perf_counter()
            res = fn(spark, out)
            stats = res.agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.col("is_semantic_dup").cast("long")).alias("dups"),
            ).first()
            sec = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "variant": qname,
                        "mult": mult,
                        "vectors": n,
                        "verdict_rows": stats["rows"],
                        "dups": stats["dups"],
                        "sec": round(sec, 2),
                    }
                ),
                flush=True,
            )
        shutil.rmtree(out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
