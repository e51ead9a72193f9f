"""Distributed evaluation metrics for classifier-driven curation.

Quality-filter pipelines live and die by their classifier: before a
score threshold gates 100 TB of documents, the score needs a measured
ROC-AUC against whatever labels exist.  The naive AUC computation
(globally rank every row, then a rank-sum) sorts the entire corpus on
one key — a single-partition window at the worst possible place.  The
scalable form used here aggregates to a per-(group, score) histogram
first: for integer scores the histogram is tiny (distinct score values
per group), the prefix-sum window runs over THAT, and the corpus-sized
data never leaves its partial-aggregatable groupBy.

AUC is the Mann-Whitney U statistic with the standard tie treatment
(ties count half): for each distinct score s,

    wins(s) = n_pos(s) * n_neg(below s),   ties(s) = n_pos(s) * n_neg(s)
    AUC = (sum wins + sum ties / 2) / (n_pos * n_neg)

computed in exact int64 arithmetic scaled to ppm (the ``* 2`` keeps the
half-tie term integral).  Exact while ``n_pos * n_neg * 2e6`` fits
int64 — ~4.6e12 pos×neg pairs per group; beyond that, bucket the
scores or shard the groups (the histogram shape itself is unbounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def binary_auc_by_group(
    df: DataFrame,
    *,
    group_col: str = "grp",
    label_col: str = "is_pos",
    score_col: str = "score",
) -> DataFrame:
    """ROC-AUC of ``score_col`` against binary ``label_col`` (0/1)
    within each ``group_col``, in ppm (exact integer arithmetic).

    Returns ``(group, n_pos, n_neg, auc_ppm)``; ``auc_ppm`` is NULL for
    degenerate groups (all-positive or all-negative — AUC undefined).
    """
    grp = F.col(group_col)
    hist = df.groupBy(grp.alias("grp"), F.col(score_col).alias("score")).agg(
        F.sum(F.col(label_col)).cast("long").alias("n_pos"),
        F.sum(1 - F.col(label_col)).cast("long").alias("n_neg"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(F.asc("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    num = hist.select(
        "grp",
        "n_pos",
        "n_neg",
        (
            2 * F.col("n_pos") * (F.sum("n_neg").over(w) - F.col("n_neg"))
            + F.col("n_pos") * F.col("n_neg")
        ).alias("num_x2"),
    )
    return num.groupBy("grp").agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.expr(
            "CASE WHEN sum(n_pos) = 0 OR sum(n_neg) = 0 THEN NULL "
            "ELSE (sum(num_x2) * 1000000L) div "
            "(2L * sum(n_pos) * sum(n_neg)) END"
        )
        .cast("long")
        .alias("auc_ppm"),
    )
