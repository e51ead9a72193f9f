#!/usr/bin/env python
"""Measure the flat-vs-hierarchical semantic-dedup crossover on
synthetic corpora a decade beyond the certification ladder, to pin
similarity.SEMANTIC_FLIP_AT on data (the rank-cutover-soak pattern).

    python tools/soak_semantic_flip.py [--sizes 220000,2200000]
                                       [--out SOAK_SEMANTIC_FLIP_r09.json]

Why this exists: the r9 assign_cells/_probe_cells vectorization moved
the crossover.  Pre-change, the flat codebook's n·k interpreted-HOF
assignment made it quadratic-in-practice (156s at 220k vectors,
LADDER_SF10_r09.json) and the hierarchy won the sf10 decade 6x.
Post-change the same stage is one BLAS matmul per Arrow batch and flat
wins that decade (10.1s vs 28.2s, LADDER_VEC_r09.json) — so the flip
threshold must be re-measured, not extrapolated from stale walls.

The corpus is deterministic (xxhash64-derived components, same law at
every size) and runs the REAL operator code: ivf_fit / assign_cells /
within_group_dup_ids for flat (k = max(8, n//1000)), ivf_fit +
sub_fit / assign_subcells / within_group_dup_ids for the two-level
hierarchy (8 x 4 leaves) — both exactly as dedup_semantic_clusters /
dedup_semantic_hierarchical compose them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from credit_card_etl_pipeline_spark.dataops import similarity as sim
from credit_card_etl_pipeline_spark.session import get_spark


def synth(spark, n: int):
    """n deterministic 64-dim quantized vectors (ints in [-1050, 1050])
    with PLANTED cluster structure: n//1000 centers, each vector =
    its center + small per-dim noise.  Uniform-random vectors make
    k-means centroids collapse (one mega-cell whose gram verdict runs
    on a single task for hours); real embedding corpora are clustered,
    and the planted centers keep fitted-cell occupancy near the
    designed ~1000 so the soak measures the operators, not a
    degenerate-input artifact."""
    n_centers = max(8, n // 1000)
    center = F.col("id") % n_centers
    # near-constant norms matter: assignment is by MAX DOT (cosine-
    # oriented, like real ~unit embeddings), so varied-norm synthetic
    # vectors all collapse onto the largest-norm centroid (measured:
    # one mega-cell, one pandas task pinned for 30+ min).  Clusters
    # are SIGN PATTERNS per center at magnitude ~1000 with ±50 noise:
    # every norm² ≈ 64·1000², dots discriminate purely by sign
    # agreement, fitted occupancy stays near the designed ~1000.
    sign = lambda d: (  # noqa: E731
        F.pmod(F.xxhash64(center * 64 + d, F.lit("ctr")), F.lit(2)) * 2 - 1
    )
    noise = lambda d: (  # noqa: E731
        F.pmod(F.xxhash64(F.col("id") * 64 + d, F.lit("noise")), F.lit(101))
        - 50
    )
    comps = F.array(
        *[
            (sign(d) * (F.lit(1000) + noise(d))).cast("long")
            for d in range(64)
        ]
    )
    return (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), comps.alias("qvec"))
        .repartition(64)
    )


def run_flat(spark, n: int) -> dict:
    vecs = synth(spark, n).persist()
    vecs.count()
    t0 = time.time()
    k = max(8, n // 1000)
    cb = sim.ivf_fit(vecs, k=k, iters=3)
    t_fit = time.time() - t0
    assigned = sim.assign_cells(vecs, cb, out_col="cell").select(
        "vec_id", "qvec", sim._norm2(F.col("qvec")).alias("n2"), "cell"
    )
    dups = sim.within_group_dup_ids(assigned, ["cell"]).count()
    wall = time.time() - t0
    occ = _occupancy(assigned, ["cell"])
    vecs.unpersist(False)
    return {"k": k, "fit_s": round(t_fit, 2), "wall_s": round(wall, 2),
            "dups": dups, **occ}


def run_hier(spark, n: int) -> dict:
    vecs = synth(spark, n).persist()
    vecs.count()
    t0 = time.time()
    coarse = sim.ivf_fit(vecs, k=8, iters=3)
    assigned0 = sim.assign_cells(vecs, coarse, out_col="cell")
    subbook = sim.sub_fit(assigned0, k_sub=4, iters=2)
    t_fit = time.time() - t0
    assigned = sim.assign_cells(vecs, coarse, out_col="cell").select(
        "vec_id", "qvec", sim._norm2(F.col("qvec")).alias("n2"), "cell"
    )
    leaves = sim.assign_subcells(assigned, subbook)
    dups = sim.within_group_dup_ids(leaves, ["cell", "subcell"]).count()
    wall = time.time() - t0
    occ = _occupancy(leaves, ["cell", "subcell"])
    vecs.unpersist(False)
    return {"k": "8x4", "fit_s": round(t_fit, 2), "wall_s": round(wall, 2),
            "dups": dups, **occ}


def _occupancy(assigned, group_cols) -> dict:
    """Max/median fitted group size (outside the timed window): the
    verdict stage is quadratic in GROUP size, so a degenerate fit
    shows up here as max >> median instead of as an unexplained
    one-task stall."""
    row = (
        assigned.groupBy(*group_cols)
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.expr("percentile(count, 0.5)").alias("md"),
        )
        .collect()[0]
    )
    return {"max_group": int(row["mx"]), "median_group": float(row["md"])}


def run_two_level(spark, n: int) -> dict:
    """Occupancy-scaled two-level form (k1 = k2 = ceil(sqrt(n/1000)),
    same composition as dedup_semantic_two_level)."""
    vecs = synth(spark, n).persist()
    vecs.count()
    t0 = time.time()
    k = sim.semantic_two_level_k(n)
    coarse = sim.ivf_fit(vecs, k=k, iters=3)
    assigned0 = sim.assign_cells(vecs, coarse, out_col="cell")
    subbook = sim.sub_fit(assigned0, k_sub=k, iters=2)
    t_fit = time.time() - t0
    assigned = sim.assign_cells(vecs, coarse, out_col="cell").select(
        "vec_id", "qvec", sim._norm2(F.col("qvec")).alias("n2"), "cell"
    )
    leaves = sim.assign_subcells(assigned, subbook)
    dups = sim.within_group_dup_ids(leaves, ["cell", "subcell"]).count()
    wall = time.time() - t0
    occ = _occupancy(leaves, ["cell", "subcell"])
    vecs.unpersist(False)
    return {"k": f"{k}x{k}", "fit_s": round(t_fit, 2),
            "wall_s": round(wall, 2), "dups": dups, **occ}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="220000,2200000")
    ap.add_argument("--out", default="SOAK_SEMANTIC_FLIP_r09.json")
    ap.add_argument(
        "--forms", default="flat,hierarchical,two_level",
        help="comma subset of flat,hierarchical,two_level",
    )
    args = ap.parse_args()
    spark = get_spark(app_name="soak_semantic_flip")
    runners = {
        "flat": run_flat,
        "hierarchical": run_hier,
        "two_level": run_two_level,
    }
    forms = [f.strip() for f in args.forms.split(",") if f.strip()]
    out = {"sizes": {}}
    for n in [int(s) for s in args.sizes.split(",")]:
        res = {f: runners[f](spark, n) for f in forms}
        winner = min(res, key=lambda f: res[f]["wall_s"])
        chosen = sim.choose_semantic_strategy(n)
        out["sizes"][str(n)] = {
            **res,
            "winner": winner,
            "choose_semantic_strategy": chosen,
            "agrees": winner == chosen,
        }
        print(
            f"SOAKQ n={n}: "
            + " vs ".join(
                f"{f} {res[f]['wall_s']}s (k={res[f]['k']})" for f in forms
            )
            + f" -> winner {winner}, selector says {chosen}"
        )
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("SOAK " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
