"""Iterative graph algorithms (engine extension).

:func:`pagerank` — weighted PageRank in EXACT integer arithmetic.
Floating-point PageRank is order-dependent (double sums over in-edges
change with partial-aggregation order), so ranks here live in integer
micro-units: contributions are truncating integer divisions and every
per-node sum is an exact integer — bit-identical on any engine, any
partition count, any aggregation order, which is what lets a genuinely
iterative algorithm be value-checked against an unrolled SQL oracle.

Scale design (the connected-components pattern from dedup.py): the
driver holds NO per-node state — each iteration is one join (ranks ⋈
edges on src, both sides pre-partitioned on the node key, so AQE
reuses the exchange) plus one groupBy(dst).  Plans grow linearly with
the iteration count; for the long-iteration case callers should
localCheckpoint every few rounds like connected_components does.
Dangling-node mass is NOT redistributed (the standard simplified
variant) — documented so the oracle agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: One unit of rank, in micro-units: big enough that truncating
#: division keeps 12 significant digits, small enough that
#: 20 · Σ ranks stays far below 2^63 for any realistic node count.
RANK_BASE = 10**12

#: Damping 0.85 as the exact rational 17/20.
DAMP_NUM, DAMP_DEN = 17, 20


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    iters: int = 3,
) -> DataFrame:
    """Weighted simplified PageRank over ``edges`` (positive integer
    weights), ``iters`` rounds, damping 17/20, all-integer math:

        contrib(u→v) = (rank_u * w_uv) div outw_u
        rank'_v      = (3*BASE) div 20  +  (17 * Σ contrib) div 20

    Returns (node, rank) for every node appearing as src or dst.
    """
    src, dst, w = F.col(src_col), F.col(dst_col), F.col(weight_col)
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
    )
    outw = edges.groupBy(src_col).agg(F.sum(weight_col).alias("outw"))
    e = (
        edges.join(outw, src_col)
        .select(
            src.alias("e_src"), dst.alias("e_dst"), w.alias("e_w"), "outw"
        )
    )
    teleport = ((DAMP_DEN - DAMP_NUM) * RANK_BASE) // DAMP_DEN
    ranks = nodes.select("node", F.lit(RANK_BASE).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["e_src"] == ranks["node"])
            .select(
                F.col("e_dst").alias("node"),
                F.expr("(rank * e_w) div outw").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(s, 0L)) div {DAMP_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return ranks
