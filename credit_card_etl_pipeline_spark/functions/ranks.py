"""Percentile ranks with exact pandas semantics (SURVEY §2.E, operator E1).

The reference ranks RFM aggregates with pandas ``rank(pct=True)``
(reference: db_to_RFManalysis.py:153-155, db_to_Payment_RFM.py:101-103,
db_to_card_RFM.py:47-48).  pandas semantics differ from Spark's
``percent_rank`` in two ways:

* ties receive their **average** rank (method='average'), and
* the rank is divided by the **non-null count** ``n`` — so results lie in
  ``(0, 1]`` rather than ``percent_rank``'s ``[0, 1)`` = ``(r-1)/(n-1)``.

For a value ``v`` with ``lt`` rows strictly before it (in the requested
order) and ``eq`` tied rows::

    avg_rank = lt + (eq + 1) / 2
    pct      = avg_rank / n

Scale design: a naive translation is ``Window.orderBy(col)`` over the
whole frame — a single-partition global sort that dies at 100 TB.
Instead we aggregate to **distinct values** (one shuffle, massively
smaller), compute the cumulative counts with a window over that tiny
distinct-value table, and broadcast-join the percentiles back.  The only
ordered pass runs over |distinct values| rows, never over the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_pct_rank(
    df: DataFrame,
    col: str,
    *,
    ascending: bool = True,
    out: str | None = None,
) -> DataFrame:
    """Append pandas-``rank(pct=True)``-semantics percentile of ``col``.

    Null inputs receive null percentiles and are excluded from ``n``
    (pandas ``NaN`` behaviour).
    """
    out = out or f"{col}_pct_rank"
    order = F.col(col).asc() if ascending else F.col(col).desc()

    vals = df.where(F.col(col).isNotNull()).groupBy(col).agg(
        F.count(F.lit(1)).alias("__eq")
    )
    w = Window.orderBy(order)
    ranked = vals.select(
        F.col(col),
        (
            (
                F.coalesce(
                    F.sum("__eq").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                )
                + (F.col("__eq") + F.lit(1)) / F.lit(2.0)
            )
            / F.sum("__eq").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        ).alias(out),
    )
    # No broadcast hint: the distinct-value table is tiny for discrete
    # metrics (recency days, frequencies) but can approach |groups| for
    # near-unique metrics (monetary sums) — let AQE pick the strategy.
    return df.join(ranked, on=col, how="left")


def with_pct_ranks(
    df: DataFrame, specs: list[tuple[str, bool, str]]
) -> DataFrame:
    """Apply :func:`with_pct_rank` for each ``(col, ascending, out)``."""
    for col, ascending, out in specs:
        df = with_pct_rank(df, col, ascending=ascending, out=out)
    return df


def pct_rank_sql(col: str, *, ascending: bool = True) -> str:
    """ANSI-SQL fragment computing the same pandas percentile over a
    window spanning the whole relation — used for DuckDB oracles.
    """
    direction = "ASC" if ascending else "DESC"
    return (
        f"(RANK() OVER (ORDER BY {col} {direction})"
        f" + (COUNT(*) OVER (PARTITION BY {col}) - 1) / 2.0)"
        f" / COUNT({col}) OVER ()"
    )
