#!/usr/bin/env python
"""Soak the two heaviest COMPOSITIONS at 10x/30x bench volume (r5
verdict item 4): the per-stage soaks proved each stage sub-linear, but
the compositions (`curation_pipeline_v2`: boilerplate -> exact dedup ->
containment -> length gate; `hypertable_rollup_refresh`: build + late
slice + dirty-bucket dynamic-partition refresh + read-back) had only
bench-scale evidence.

Inflates the sf0.1 corpus into a temp dir shaped like an sf dir, then
drives the REGISTERED query functions unchanged on it:

* events: copy c shifts event_id/user_id and adds c days to ts, so the
  bucket count grows with volume and the late-data rule dirties many
  buckets (~50% of (bucket,type) cells) at every scale;
* documents: copy c strides doc_id by 5000 (stays < the query's own
  +1M/+2M synthetic-id offsets) and PREPENDS a per-copy tag token so
  copies are not cross-copy dups — the tag must lead the text because
  the containment stage blocks on first-3-word anchors and snippets
  are 12-word prefixes: a TRAILING tag leaves every copy's prefix
  identical, which manufactures ~copies^2 genuine containment pairs
  and measures that synthetic dup explosion instead of the operator
  (first run of this soak: 30x documents -> 11x wall, entirely from
  trailing-tag anchor collisions; prepended, the dup/boilerplate
  structure stays per-copy, matching the bench distribution).

    python tools/soak_r6comps.py [mults...]   # default 10 30

One JSON line per (query, mult): rows, wall seconds.
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


def inflate(spark, mult: int) -> str:
    out = tempfile.mkdtemp(prefix=f"soak_r6_x{mult}_")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    parts = []
    for c in range(mult):
        parts.append(
            ev.select(
                (F.col("event_id") + c * 100_000).alias("event_id"),
                (F.col("user_id") + c * 1_500).alias("user_id"),
                "event_type",
                (F.col("ts") + F.expr(f"INTERVAL {c} DAYS")).alias("ts"),
                "value",
                *[x for x in ev.columns
                  if x not in ("event_id", "user_id", "event_type", "ts", "value")],
            )
        )
    inflated = parts[0]
    for p in parts[1:]:
        inflated = inflated.unionByName(p)
    inflated.write.mode("overwrite").parquet(f"{out}/events.parquet")

    from soak_common import write_inflated_documents

    write_inflated_documents(spark, SRC, out, mult)
    return out


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [10, 30]
    spark = get_spark(app_name="soak_r6comps")
    from credit_card_etl_pipeline_spark.queries.curate_queries import (
        curation_pipeline_v2,
    )
    from credit_card_etl_pipeline_spark.queries.warehouse_queries import (
        hypertable_rollup_refresh,
    )

    for mult in mults:
        sf_dir = inflate(spark, mult)
        n_ev = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        for name, fn, rows in (
            ("hypertable_rollup_refresh", hypertable_rollup_refresh, n_ev),
            ("curation_pipeline_v2", curation_pipeline_v2, n_docs),
        ):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            sec = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "query": name,
                        "mult": mult,
                        "rows": rows,
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
