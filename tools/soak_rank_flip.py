#!/usr/bin/env python
"""Soak the adaptive rank strategy PAST its cutover (VERDICT r8 ask #7).

No registry query reaches SMALL_INPUT_THRESHOLD (32M rows), so the
two-pass rank path (functions/ranks.py) was only ever unit-tested at
toy sizes and the threshold flip itself was never observed on an
above-threshold relation.  This soak:

1. synthesizes an above-threshold relation (default 33M rows,
   ~28M distinct metric values — the near-unique regime the
   distributed path exists for);
2. asserts the rfm.py decision rule (``n >= SMALL_INPUT_THRESHOLD``)
   actually flips to the distributed strategy at this size;
3. asserts the flip is PHYSICAL: the distributed plan range-partitions
   the ordered pass (RangePartitioning in the explain) while the plain
   plan funnels a global single-partition Window;
4. verifies bit-exact parity between the two strategies on every
   distinct value (both reduce to (lt + (eq+1)/2) / n with exactly
   representable numerators — any mismatch is a real bug);
5. times both, so the threshold's cost rationale stays measured.

Prints one JSON line; nonzero exit on any assertion failure.

    python tools/soak_rank_flip.py [--rows 33000000]
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
    ap.add_argument("--rows", type=int, default=33_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.functions.ranks import (
        SMALL_INPUT_THRESHOLD,
        with_pct_rank,
    )
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soak_rank_flip")

    # near-unique metric with deliberate ties: ~2x value space keeps
    # ~ N*(1-e^-0.5) ~= 0.79N distinct, so tie handling is exercised
    df = spark.range(args.rows).select(
        (
            F.xxhash64("id", F.lit("rankflip"))
            .bitwiseAND(F.lit((1 << 62) - 1))
            % F.lit(args.rows * 2)
        ).alias("metric")
    )
    n = df.count()

    # (2) the decision rule the RFM operators apply (operators/rfm.py)
    flipped = n >= SMALL_INPUT_THRESHOLD
    assert flipped, (
        f"soak misconfigured: {n} rows sits under "
        f"SMALL_INPUT_THRESHOLD={SMALL_INPUT_THRESHOLD}; raise --rows"
    )

    dist = with_pct_rank(df, "metric", out="pct")
    plain = with_pct_rank(df, "metric", out="pct", distributed=False)

    # (3) physical shape of each strategy.  The distributed path's
    # range exchange runs EAGERLY inside with_pct_rank (the pinning
    # localCheckpoint executes it), so in the final plan it appears as
    # a Scan ExistingRDD of the checkpointed range-partitioned distinct
    # table — that scan is the physical signature of the two-pass
    # strategy; the plain path has no checkpoint and keeps its global
    # single-partition Window inline.
    dist_plan = dist._jdf.queryExecution().executedPlan().toString()
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "existingrdd" in dist_plan.lower(), (
        "distributed rank plan lost its checkpointed range-partitioned "
        "pass"
    )
    assert "existingrdd" not in plain_plan.lower() and (
        "window" in plain_plan.lower()
    ), "plain rank plan is not the inline single-window form"

    # (4) + (5): one rank table per strategy, then an exact anti-join
    t0 = time.time()
    d_vals = (
        dist.groupBy("metric").agg(F.first("pct").alias("pct_d"))
    ).localCheckpoint(eager=True)
    wall_dist = time.time() - t0
    t0 = time.time()
    p_vals = (
        plain.groupBy("metric").agg(F.first("pct").alias("pct_p"))
    ).localCheckpoint(eager=True)
    wall_plain = time.time() - t0

    joined = d_vals.join(p_vals, "metric", "full")
    mismatches = joined.where(
        F.col("pct_d").isNull()
        | F.col("pct_p").isNull()
        | (F.col("pct_d") != F.col("pct_p"))
    ).count()
    n_distinct = d_vals.count()
    assert mismatches == 0, f"{mismatches} value-rank mismatches"

    print(
        json.dumps(
            {
                "soak": "rank_flip",
                "rows": n,
                "n_distinct": n_distinct,
                "threshold": SMALL_INPUT_THRESHOLD,
                "flipped_to_distributed": flipped,
                "dist_plan_range_partitioned": True,
                "parity_mismatches": mismatches,
                "wall_distributed_s": round(wall_dist, 2),
                "wall_plain_single_window_s": round(wall_plain, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
