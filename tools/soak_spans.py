#!/usr/bin/env python
"""Scale soak for duplicate_spans (sliding-window ExactSubstr dedup).

Inflates the sf0.1 documents table by prepending a per-copy tag token
to each copy — which makes every copy's BODY an exact cross-copy
repeat, so every window slot past the tag is marked duplicated.  That
is the WORST case for this operator: the frequency-filter join passes
essentially the whole slot table and the per-doc merge window sees
every position.  The operator has no pair join (slots shuffle as
60-bit hashes, the frequency count is map-side combinable), so wall
time should stay near-linear in corpus size even at full marking
density.

    python tools/soak_spans.py [mults...]    # default 10 30

One JSON line per mult: docs, window slots, result spans, wall seconds.
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


def inflate_docs(spark, mult: int) -> str:
    from soak_common import write_inflated_documents

    out = tempfile.mkdtemp(prefix=f"soak_spans_x{mult}_")
    write_inflated_documents(spark, SRC, out, mult)
    return out


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [10, 30]
    spark = get_spark(app_name="soak_spans")
    from credit_card_etl_pipeline_spark.dataops import dedup as dd
    from credit_card_etl_pipeline_spark.dataops.text import words

    for mult in mults:
        sf_dir = inflate_docs(spark, mult)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n_docs = docs.count()
        n_slots = (
            docs.select(
                F.greatest(
                    F.size(words(F.col("text"))) - 7, F.lit(0)
                ).alias("n")
            )
            .agg(F.sum("n"))
            .first()[0]
        )
        t0 = time.perf_counter()
        n_spans = dd.duplicate_spans(docs, k=8).count()
        sec = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "query": "duplicate_spans",
                    "mult": mult,
                    "docs": n_docs,
                    "window_slots": int(n_slots),
                    "spans": n_spans,
                    "sec": round(sec, 2),
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()
        shutil.rmtree(sf_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
