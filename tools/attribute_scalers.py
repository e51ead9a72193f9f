#!/usr/bin/env python
"""Attribute the registry's two worst sf0.1->sf1 scalers (VERDICT r8
ask #3): is the super-linear wall growth DATA-driven (duplicate-pair
density rising with the corpus) or ALGORITHMIC (a hidden quadratic)?

Method: time each query on three corpora and measure its volume
driver alongside the wall —

* sf0.1 (driver corpus, baseline),
* sf1 = uniform 10x replication (dup CLUSTERS replicate too: 10x
  rows -> 10x near-dup pairs),
* sf1ctl = constant-density control (``make_scale.py --doc-unique``:
  10x rows, but replicas carry zero cross-doc shingle overlap, so the
  near-dup pair count stays at the sf0.1 level).

For ``documents_leakage_safe_split`` the driver is the LSH candidate
pair count feeding connected components; for ``curate_lm_typicality``
it is bigram instances (explode volume) and distinct grams (fit-table
cardinality).  If wall tracks the driver on all three corpora, growth
is data-driven and the pair-count law goes in SCALE.md; a control
wall that still grows ~like sf1 would expose an algorithmic problem.

    python tools/attribute_scalers.py [--sf01 /root/testdata/sf0.1]
        [--sf1 .scale/sf1] [--ctl .scale/sf1ctl]

Prints one JSON line per query plus a combined ATTRIB line.
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
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default=".scale/sf1")
    ap.add_argument("--ctl", default=".scale/sf1ctl")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from credit_card_etl_pipeline_spark import dataops
    from credit_card_etl_pipeline_spark.dataops import dedup as dd
    from credit_card_etl_pipeline_spark.queries import load
    from credit_card_etl_pipeline_spark.queries.dataops_queries import corpus
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="attribute_scalers")
    queries = entrymod.queries()
    corpora = {"sf0.1": args.sf01, "sf1": args.sf1, "sf1ctl": args.ctl}
    out: dict[str, dict] = {}

    for name in ("documents_leakage_safe_split", "curate_lm_typicality"):
        res: dict[str, dict] = {}
        for label, root in corpora.items():
            # volume drivers (measured separately so driver cost does
            # not pollute the query wall)
            drivers: dict[str, int] = {}
            if name == "documents_leakage_safe_split":
                c = corpus(spark, root)
                sig = dd.minhash_signatures(dd.exploded_shingles(c))
                pairs = dd.lsh_candidate_pairs(
                    sig, bands=2, rows=4, max_bucket_size=None
                )
                drivers["lsh_pairs"] = pairs.count()
            else:
                docs = load(spark, root, "documents")
                toks = docs.select(
                    F.size(F.split(F.lower("text"), r"\s+")).alias("n")
                )
                drivers["bigram_instances"] = int(
                    toks.agg(
                        F.sum(F.greatest(F.col("n") - 1, F.lit(0)))
                    ).first()[0]
                )
            t0 = time.time()
            n_rows = queries[name](spark, root).count()
            wall = round(time.time() - t0, 2)
            res[label] = {"wall_s": wall, "rows": n_rows, **drivers}
            print(f"{name} @ {label}: {res[label]}", flush=True)
        out[name] = res

    print("ATTRIB " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
