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

``--skew zipf:<s>`` additionally makes the corpus HOSTILE (VERDICT r8
ask #1): uniform replication cannot expose hot-key cliffs, so this
mode rewrites key/value distributions zipfian while keeping every FK
valid (hot keys are real base-replica parents):

* FK remap — a deterministic ``alpha``-share (60%) of rows in
  orders.o_custkey, lineitem.l_partkey/l_suppkey and events.user_id
  re-point at one of the 16 base-keyspace hot keys with weight
  ``rank^-s`` (s from the flag; s=1.5 puts ~28% of ALL rows on the
  single hottest key ≈ 9x the even 32-partition load — past the
  measured 6x salting crossover in operators/skew.py);
* documents — 3% of docs collapse onto 5 shared boilerplate variants
  (mega exact/near-dup cluster: hot LSH buckets, hot shingle
  anchors, a fat connected component);
* embeddings — 10% of vectors migrate to one tight region (skewed
  centroid assignment for IVF/SemDeDup cells).

Everything is hash-seeded from primary keys: the corpus is a pure
function of (src, mult, s) and the DuckDB oracle recomputes on the
identical files, so hash-parity certification still applies.

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

#: --skew: FK columns remapped zipfian; (column, seed, pk cols whose
#: hash drives the draw — replica-offset PKs, so replicas differ)
_SKEW_FKS: dict[str, list[tuple[str, str, list[str]]]] = {
    "orders": [("o_custkey", "zipf:cust", ["o_orderkey"])],
    "lineitem": [
        ("l_partkey", "zipf:part", ["l_orderkey", "l_linenumber"]),
        ("l_suppkey", "zipf:supp", ["l_orderkey", "l_linenumber"]),
    ],
    "events": [("user_id", "zipf:user", ["event_id"])],
}

_HOT_K = 16      # hot-key catalogue size (base keyspace 0..K-1)
_HOT_ALPHA = 0.6  # share of rows redirected at the hot catalogue

_HOT_TEXTS = [
    "hot boilerplate variant %d : this shared promotional footer is "
    "repeated verbatim across a large slice of the corpus, the exact "
    "pathology web-scale dedup must absorb — identical shingles, "
    "identical minhash signatures, one mega bucket. unsubscribe at "
    "any time. terms and conditions apply. all rights reserved." % i
    for i in range(5)
]


def _uniform(F, pks: list[str], seed: str):
    """Deterministic uniform in [0,1) from the row's (offset) PKs."""
    h = F.xxhash64(*[F.col(c) for c in pks], F.lit(seed))
    return h.bitwiseAND(F.lit((1 << 40) - 1)).cast("double") / float(1 << 40)


def _zipf_remap(F, u, orig, dtype: str, s: float):
    """CASE chain: u under the cumulative zipf thresholds -> hot key
    rank (base keyspace 0.._HOT_K-1), else the original key."""
    w = [(i + 1) ** -s for i in range(_HOT_K)]
    tot = sum(w)
    expr = orig
    acc, branches = 0.0, []
    for i, wi in enumerate(w):
        acc += wi
        branches.append((_HOT_ALPHA * acc / tot, i))
    for thresh, key in reversed(branches):
        expr = F.when(u < F.lit(thresh), F.lit(key).cast(dtype)).otherwise(
            expr
        )
    return expr


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
    ap.add_argument(
        "--skew",
        default=None,
        help="'zipf:<s>' — make the corpus hostile: zipfian hot keys "
        "on FK columns, a mega dup cluster in documents, one hot "
        "embedding region (see module docstring)",
    )
    ap.add_argument(
        "--doc-unique",
        action="store_true",
        help="constant-density control (VERDICT r8 ask #3): replica-0 "
        "documents keep the planted near-dup structure, but every "
        "rep>0 doc gets a per-doc salt prefixed onto EVERY word, so "
        "cross-doc shingle/ngram overlap is zero outside rep 0 — the "
        "near-dup PAIR count stays fixed while rows grow mult-x.  "
        "Token counts are preserved (+1 salt token of width 8/word "
        "never splits or merges words), so token-linear operators see "
        "the same per-row work.  Re-sloping a dup-density-sensitive "
        "query on this corpus separates data-driven growth (pair "
        "fan-out) from algorithmic growth.",
    )
    args = ap.parse_args()
    zipf_s = None
    if args.skew:
        kind, _, sval = args.skew.partition(":")
        if kind != "zipf" or not sval:
            raise SystemExit(f"--skew must be zipf:<s>, got {args.skew!r}")
        zipf_s = float(sval)

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
            if args.doc_unique:
                # per-doc 7-hex salt + '_' glued onto every word: token
                # count preserved, cross-doc shingles disjoint for
                # rep>0 (see --doc-unique help)
                salt = F.substring(
                    F.sha2(
                        F.concat(F.lit("ctl:"), F.col("doc_id").cast("string")),
                        256,
                    ),
                    1,
                    7,
                )
                salted = F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(salt, F.lit(r"_$1")),
                )
                out = out.withColumn(
                    "text",
                    F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                        salted
                    ),
                )
            else:
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
                )
            out = out.withColumn("n_chars", F.length("text").cast("long"))
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
        if zipf_s is not None:
            for col, seed, pks in _SKEW_FKS.get(table, []):
                u = _uniform(F, pks, seed)
                out = out.withColumn(
                    col,
                    _zipf_remap(
                        F, u, F.col(col), dict(src.dtypes)[col], zipf_s
                    ),
                )
            if table == "documents":
                hot = _uniform(F, ["doc_id"], "zipf:doc") < 0.03
                variant = (
                    F.xxhash64("doc_id", F.lit("zipf:docv"))
                    .bitwiseAND(F.lit(0x7FFFFFFF))
                    % len(_HOT_TEXTS)
                )
                hot_text = F.element_at(
                    F.array(*[F.lit(t) for t in _HOT_TEXTS]),
                    (variant + 1).cast("int"),
                )
                out = out.withColumn(
                    "text", F.when(hot, hot_text).otherwise(F.col("text"))
                ).withColumn("n_chars", F.length("text").cast("long"))
            if table == "embeddings":
                hot = _uniform(F, ["vec_id"], "zipf:vec") < 0.10
                # migrate hot vectors into one tight region: a fixed
                # cos(i) anchor point + 1% of the original coordinates
                # (keeps vectors distinct -> no degenerate rank ties)
                out = out.withColumn(
                    "embedding",
                    F.when(
                        hot,
                        F.transform(
                            "embedding",
                            lambda x, i: (
                                F.cos(i.cast("double")) + x * 0.01
                            ).cast("float"),
                        ),
                    ).otherwise(F.col("embedding")),
                )
        emit(table, out.drop("__rep").select(*src.columns), args.files)

    print(f"done -> {args.dst}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
