#!/usr/bin/env python
"""Generate a faithful N-times scale-up of a driver corpus for
cross-scale certification (the driver ships sf0.1 at most; VERDICT r7
asked for a one-order-up parity point to catch int64/overflow or skew
cliffs the synthetic soaks can't).

    python tools/make_scale.py [--mult 10] [--src /root/testdata/sf0.1]
                               [--dst .scale/sf1]

Replication keeps every invariant the queries rely on:

* fixed dims (region, nation) copy unchanged;
* every other table replicates ``mult``x with keys offset by
  ``rep * keyspan`` so FK chains (orders->customer, lineitem->orders/
  part/supplier, embeddings->docs) stay consistent PER REPLICA —
  replica r is a parallel universe with the same value distributions;
* events offset user_id too (independent user populations — funnel /
  sessionization selectivity per user is preserved, total users 10x);
* documents perturb text for rep>0 (replica tag prefix) so the corpus
  isn't 10 exact copies — rep 0 keeps the planted near-dup structure —
  and n_chars is recomputed to keep the n_chars==len(text) invariant;
* embeddings perturb one coordinate per replica (deterministic) so
  ANN distance ties don't explode; label/dim preserved.

Written with Spark so parquet logical types (timestamp_ntz ts) match
the driver corpus exactly, then each table is collapsed to the single
``<table>.parquet`` FILE layout check_oracle/DuckDB expect.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: table -> {key column: span to offset by} (span = max key + 1 at any
#: sf, derivable but pinned from the generator's dense 0..N-1 keys)
_SPECS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

#: where each keyspan is measured: (table, column)
_SPAN_SOURCES = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(ROOT, ".scale", "sf1"))
    ap.add_argument(
        "--files",
        type=int,
        default=16,
        help="part files per replicated table (fixed dims stay single-"
        "file).  >1 writes <table>.parquet as a DIRECTORY — the layout "
        "a real corpus has; a coalesce(1) single file is also a single "
        "parquet row group, which caps every map stage at ONE task and "
        "made the r8 slope table overstate map-heavy exponents.  The "
        "oracle tooling globs directory tables (check_oracle.py).",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="make_scale")
    os.makedirs(args.dst, exist_ok=True)

    spans = {
        name: spark.read.parquet(f"{args.src}/{tab}.parquet")
        .agg(F.max(col))
        .collect()[0][0]
        + 1
        for name, (tab, col) in _SPAN_SOURCES.items()
    }

    def emit(table: str, df, n_files: int) -> None:
        dest = os.path.join(args.dst, f"{table}.parquet")
        if n_files <= 1:
            tmp = os.path.join(args.dst, f"__tmp_{table}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))
            assert len(part) == 1, part
            if os.path.isdir(dest):
                shutil.rmtree(dest)
            shutil.move(part[0], dest)
            shutil.rmtree(tmp)
        else:
            if os.path.isfile(dest):
                os.remove(dest)
            df.repartition(n_files).write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{table}: {n} rows ({n_files} file(s))", flush=True)

    for table in ("region", "nation"):
        emit(table, spark.read.parquet(f"{args.src}/{table}.parquet"), 1)

    for table, keymap in _SPECS.items():
        src = spark.read.parquet(f"{args.src}/{table}.parquet")
        rep = src.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias(
                "__rep"
            ),
            "*",
        )
        out = rep
        for col, span_name in keymap.items():
            out = out.withColumn(
                col,
                (
                    F.col(col) + F.col("__rep") * F.lit(spans[span_name])
                ).cast(dict(src.dtypes)[col]),
            )
        if table == "documents":
            out = out.withColumn(
                "text",
                F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.lit("r"),
                        F.col("__rep").cast("string"),
                        F.lit(" "),
                        F.col("text"),
                    )
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        if table == "embeddings":
            # deterministic per-replica nudge on coordinate 0 keeps
            # distance ties from exploding while preserving geometry
            out = out.withColumn(
                "embedding",
                F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.array(
                            (
                                F.element_at("embedding", 1)
                                + F.col("__rep").cast("float") * F.lit(1e-3)
                            ).cast("float")
                        ),
                        F.slice(
                            "embedding", 2, F.size("embedding") - 1
                        ),
                    )
                ),
            )
        emit(table, out.drop("__rep").select(*src.columns), args.files)

    print(f"done -> {args.dst}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
