#!/usr/bin/env python
"""Scale soak for ivm_merge under HOSTILE churn: the delta feed
empties entire groups (death), births brand-new keys, and updates the
rest — the distribution the registered query's TPC-H churn never
produces (its deletes are ~1/11 spread uniformly, so no priority ever
empties).

    python tools/soak_ivm.py [--mult 20] [--groups 50000] [--sf ...]

The base fact is lineitem inflated ``mult``x and re-keyed to
``groups`` synthetic group keys.  Churn: every key ending in 7 is
FULLY deleted, every key ending in 3 gets one update row, and
``groups // 10`` never-seen keys are born.  The merged view is checked
EXACTLY against a DuckDB recompute of the post-churn snapshot, and the
wall time is reported per phase (delta aggregation vs merge) so the
refresh-cost-~-churn claim stays measured.

Prints one JSON line; run at two mults to read the slope.
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
    ap.add_argument("--mult", type=int, default=20)
    ap.add_argument("--groups", type=int, default=50_000)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.session import get_spark
    from credit_card_etl_pipeline_spark.warehouse import ivm_merge

    spark = get_spark(app_name="soak_ivm")

    li = spark.read.parquet(f"{args.sf}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    fact = (
        li.select(
            F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))).alias(
                "rep"
            ),
            "l_orderkey",
            "l_partkey",
        )
        .select(
            (
                (F.col("l_orderkey") * args.mult + F.col("rep"))
                % args.groups
            ).alias("k"),
            (F.col("l_partkey") + F.col("rep")).cast("long").alias("amt"),
        )
        .localCheckpoint(True)
    )
    n_fact = fact.count()

    view0 = fact.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("amt").cast("long").alias("total"),
    ).localCheckpoint(True)

    # ---- hostile churn -------------------------------------------------
    # death: every key = 7 (mod 10) is fully deleted
    # update: every key = 3 (mod 10) gains one row of amt 1000
    # birth: groups//10 keys ABOVE the key space, 2 rows each of amt 5
    t0 = time.time()
    deaths = view0.where(F.col("k") % 10 == 7).select(
        "k", (-F.col("n")).alias("dn"), (-F.col("total")).alias("damt")
    )
    updates = view0.where(F.col("k") % 10 == 3).select(
        "k", F.lit(1).cast("long").alias("dn"),
        F.lit(1000).cast("long").alias("damt"),
    )
    births = spark.range(args.groups, args.groups + args.groups // 10).select(
        F.col("id").alias("k"),
        F.lit(2).cast("long").alias("dn"),
        F.lit(10).cast("long").alias("damt"),
    )
    deltas = (
        deaths.unionByName(updates)
        .unionByName(births)
        .groupBy("k")
        .agg(
            F.sum("dn").cast("long").alias("dn"),
            F.sum("damt").cast("long").alias("damt"),
        )
        .localCheckpoint(True)
    )
    n_deltas = deltas.count()
    delta_sec = round(time.time() - t0, 2)

    t0 = time.time()
    merged = ivm_merge(
        view0, deltas, keys=["k"], count_col="n", sum_cols={"damt": "total"}
    )
    got = merged.toPandas().sort_values("k").reset_index(drop=True)
    merge_sec = round(time.time() - t0, 2)

    # ---- exact recompute oracle (DuckDB over the same frames) ----------
    base_pdf = fact.toPandas()
    con = duckdb.connect()
    con.register("base", base_pdf)
    want = con.execute(
        f"""
        WITH survivors AS (
            SELECT k, amt FROM base WHERE k % 10 != 7
        ),
        updated AS (
            SELECT k, CAST(1000 AS BIGINT) AS amt
            FROM (SELECT DISTINCT k FROM base WHERE k % 10 = 3)
        ),
        born AS (
            SELECT k, CAST(5 AS BIGINT) AS amt
            FROM (
                SELECT unnest(range({args.groups},
                              {args.groups + args.groups // 10})) AS k
            ), (SELECT 1 UNION ALL SELECT 2)
        )
        SELECT k, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(amt) AS BIGINT) AS total
        FROM (SELECT * FROM survivors
              UNION ALL SELECT * FROM updated
              UNION ALL SELECT * FROM born)
        GROUP BY k ORDER BY k
        """
    ).df()

    match = (
        len(got) == len(want)
        and (got["k"].values == want["k"].values).all()
        and (got["n"].values == want["n"].values).all()
        and (got["total"].values == want["total"].values).all()
    )
    print(
        json.dumps(
            {
                "op": "ivm_merge_hostile",
                "mult": args.mult,
                "groups": args.groups,
                "fact_rows": n_fact,
                "delta_groups": n_deltas,
                "view_groups_out": len(got),
                "deaths": int(args.groups / 10),
                "births": args.groups // 10,
                "delta_sec": delta_sec,
                "merge_sec": merge_sec,
                "oracle_match": bool(match),
            }
        ),
        flush=True,
    )
    return 0 if match else 1


if __name__ == "__main__":
    raise SystemExit(main())
