#!/usr/bin/env python
"""Composition soak for curation_pipeline_v4 — the heaviest registered
query (DSIR gate x LSH components x embedding outlier prune x
leakage-safe split).  Its stages are each soaked sub-linear elsewhere;
this drives the REGISTERED composition unchanged on an inflated dir.

Both tables inflate with the SAME per-copy id stride (10 000) so the
pipeline's doc_id = vec_id inner join keeps full coverage at every
mult (misaligned strides would silently drop inflated copies from the
verdict ledger and under-measure the join).  Documents get the leading
copy tag (soak_common rationale); embeddings get a 6-bit sign-flip
pattern so copies are distinct corpus members, not manufactured
near-dups — valid for mults up to 64 (enforced; beyond the pattern
count copies would alias into exact duplicates).

    python tools/soak_v4.py [mults...]   # default 10 30

One JSON line per mult: docs, vectors, ledger rows, wall seconds.
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
STRIDE = 10_000


#: Sign-flip pattern width: 6 bits = 64 distinct patterns, so any two
#: copies c1 != c2 (mult <= 64) differ in >= ~10 flipped dims —
#: cosine far below the dedup thresholds.  A narrower mask silently
#: aliases copies (c and c+2^width get identical embeddings) and the
#: soak measures a manufactured dup explosion instead of the pipeline.
_FLIP_BITS = 6


def _flip_fn(fl):
    if not fl:
        return lambda x, i: x
    return lambda x, i: F.when(i.isin(fl), -x).otherwise(x)


def inflate(spark, mult: int) -> str:
    from soak_common import write_inflated_documents

    out = tempfile.mkdtemp(prefix=f"soak_v4_x{mult}_")
    write_inflated_documents(spark, SRC, out, mult, stride=STRIDE)
    if mult > (1 << _FLIP_BITS):
        raise ValueError(
            f"mult {mult} exceeds the {1 << _FLIP_BITS} distinct flip "
            "patterns — copies would alias into exact duplicates and the "
            "soak would measure synthetic dup blowup, not the pipeline"
        )
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    parts = []
    for c in range(mult):
        flips = [i for i in range(64) if (c >> (i % _FLIP_BITS)) & 1]
        parts.append(
            emb.select(
                (F.col("vec_id") + c * STRIDE).alias("vec_id"),
                F.transform("embedding", _flip_fn(flips)).alias("embedding"),
                *[x for x in emb.columns if x not in ("vec_id", "embedding")],
            )
        )
    inf = parts[0]
    for p in parts[1:]:
        inf = inf.unionByName(p)
    inf.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [10, 30]
    spark = get_spark(app_name="soak_v4")
    from credit_card_etl_pipeline_spark.functions import caching
    from credit_card_etl_pipeline_spark.queries import QUERIES

    fn = QUERIES["curation_pipeline_v4"]
    for mult in mults:
        sf_dir = inflate(spark, mult)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        sec = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "query": "curation_pipeline_v4",
                    "mult": mult,
                    "docs": n_docs,
                    "vecs": n_vecs,
                    "ledger_rows": rows,
                    "sec": round(sec, 2),
                }
            ),
            flush=True,
        )
        caching.release_tracked()
        spark.catalog.clearCache()
        shutil.rmtree(sf_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
