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

#: One unit of rank, in nano-units.  10^9 keeps ~9 significant digits
#: through the truncating divisions while the total rank mass
#: (|nodes| x BASE) stays under 2^63/20 up to ~5x10^8 nodes — the
#: original 10^12 base left only ~4x10^5 nodes of headroom, which the
#: r9 zipf-skewed corpus blew through (hot node rank x edge weight
#: overflowed BIGINT in the oracle's unrolled round 3).
RANK_BASE = 10**9

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

    The contribution is EVALUATED via the exact split-division
    identity ``w*(rank div outw) + ((rank mod outw)*w) div outw``
    (rank = q*outw + rem  ⇒  floor(rank*w/outw) = q*w +
    floor(rem*w/outw)): the naive ``rank*w`` product overflows BIGINT
    once a hot node's rank meets a hot edge weight (caught by the r9
    skewed certification corpus), while the split form is bounded by
    the total rank mass on one side and outw² on the other — safe to
    ~5x10^8 nodes and ~3x10^9 per-node out-weight.

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
                F.expr(
                    "e_w * (rank div outw)"
                    " + ((rank % outw) * e_w) div outw"
                ).alias("c"),
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


def triangle_counts(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Per-node triangle participation counts over the UNDIRECTED
    simple graph of ``edges`` (direction and multiplicity dropped).

    Degree-ordered orientation — each undirected edge points from its
    lower-(degree, id) endpoint to the higher one — before the wedge
    join: the classic trick that bounds per-node join fan-out by the
    graph's degeneracy instead of its max degree, which is what keeps
    the wedge stage alive on power-law graphs at 100 TB (a celebrity
    node's d² wedge explosion never materializes).  Two shuffles: the
    wedge self-join on the mid node and the closing semi-join on the
    (lo, hi) edge key.

    ``checkpoint=True`` (default) eagerly localCheckpoints the
    undirected and oriented edge sets — each feeds 2+ consumers, and
    the r11 A/B showed the materialization wins decisively (44
    exchanges → 3).  Tradeoffs, stated plainly: (a) construction
    triggers Spark jobs at CALL time, not first-action time; (b)
    ``localCheckpoint`` blocks are NON-reliable — losing an executor
    mid-query forces recompute-from-nothing of the lost blocks (edge
    sets are |E|-bounded, far smaller than the wedge stage they feed,
    so the re-run is cheap relative to the query).  A caller on a
    preemption-heavy cluster can pass ``checkpoint=False`` for pure
    lazy lineage, or route through the reliable-checkpoint helper used
    by :func:`connected_components` when |E| itself is huge."""
    u, v = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(
            F.least(u, v).alias("a"), F.greatest(u, v).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    if checkpoint:
        und = und.localCheckpoint(eager=True)
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = (
        und.join(deg.withColumnRenamed("n", "a"), "a")
        .withColumnRenamed("d", "da")
        .join(
            deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"),
            "b",
        )
    )
    # orient lo -> hi by (degree, id)
    lo = F.when(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
        F.col("a"),
    ).otherwise(F.col("b"))
    hi = F.when(lo == F.col("a"), F.col("b")).otherwise(F.col("a"))
    oriented = ranked.select(lo.alias("lo"), hi.alias("hi"))
    if checkpoint:
        oriented = oriented.localCheckpoint(eager=True)

    w1 = oriented.select(
        F.col("lo").alias("p"), F.col("hi").alias("q1")
    )
    w2 = oriented.select(
        F.col("lo").alias("p"), F.col("hi").alias("q2")
    )
    wedges = w1.join(w2, "p").where(F.col("q1") < F.col("q2"))
    closing = und.select(
        F.col("a").alias("q1"), F.col("b").alias("q2")
    )
    tris = wedges.join(closing, ["q1", "q2"]).select(
        F.col("p").alias("x"), F.col("q1").alias("y"), F.col("q2").alias("z")
    )
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return per_node


#: "Unreachable" sentinel for shortest_paths — far above any real
#: k-hop cost (k·max_cost ≤ 4·10^6 here) yet safe to add a cost to
#: without approaching int64.
SP_INF = 10**15


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    cost_col: str = "cost",
    iters: int = 4,
) -> DataFrame:
    """Hop-bounded single-source-set shortest paths (Bellman-Ford,
    ``iters`` relaxation rounds) over positive INTEGER edge costs.

    Each round is one join (frontier ⋈ edges on src) + one
    groupBy(dst) min + one key-aligned left join back — the same
    bounded-driver-state iteration shape as :func:`pagerank` and
    connected components; no per-node state ever reaches the driver.
    Integer costs make every relaxation exact, so the full distance
    table is value-checkable against an unrolled SQL oracle.  Returns
    (node, dist) for nodes reachable within ``iters`` hops.

    ``seeds`` must have a single ``node`` column; duplicate seed rows
    are tolerated (deduplicated here — a left join against a
    non-distinct seed set would multiply dist rows and every
    downstream round would propagate the duplicates).
    """
    src, dst = F.col(src_col), F.col(dst_col)
    seed_nodes = seeds.select("node").distinct()
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .unionByName(seed_nodes)
        .distinct()
    )
    e = edges.select(
        src.alias("e_src"), dst.alias("e_dst"), F.col(cost_col).alias("e_cost")
    )
    dist = nodes.join(
        seed_nodes.select("node", F.lit(0).cast("long").alias("seed0")),
        "node",
        "left",
    ).select("node", F.coalesce("seed0", F.lit(SP_INF)).alias("dist"))
    for _ in range(iters):
        relax = (
            e.join(
                dist.where(F.col("dist") < SP_INF),
                e["e_src"] == F.col("node"),
            )
            .select(
                F.col("e_dst").alias("node"),
                (F.col("dist") + F.col("e_cost")).alias("cand"),
            )
            .groupBy("node")
            .agg(F.min("cand").alias("rd"))
        )
        dist = dist.join(relax, "node", "left").select(
            "node",
            F.least(
                F.col("dist"), F.coalesce("rd", F.lit(SP_INF))
            ).alias("dist"),
        )
    return dist.where(F.col("dist") < SP_INF)
