"""Registry of driver-checkable queries and their DuckDB oracles.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable exercising one
operator family from SURVEY §2 on the driver's TPC-H-ish corpus
(/root/testdata/sf*/...).  ``ORACLES`` holds the ANSI-SQL equivalent the
driver runs in DuckDB over the same parquet files; column names/types are
aligned on both sides because the driver compare hashes values after
sorting columns by name.

Determinism notes (double-precision sums are order-dependent):
* money aggregates are computed in **integer cents** (exact, associative)
  and divided back to 2-decimal doubles at output — bit-identical across
  engines regardless of partial-aggregation order;
* percentile ranks are exact rationals evaluated identically both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import rfm as rfm_ops

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------
# pandas-semantics percentile rank fragments (see functions.ranks):
# avg-rank-of-ties / non-null count, null inputs excluded and 0-filled.
# --------------------------------------------------------------------

def _pct_rank_sql(col: str, asc: bool) -> str:
    direction = "ASC" if asc else "DESC"
    return (
        f"(RANK() OVER (ORDER BY {col} {direction} NULLS LAST)"
        f" + (COUNT(*) OVER (PARTITION BY {col}) - 1) / 2.0)"
        f" / COUNT({col}) OVER ()"
    )


def _scoped_pct_rank_sql(col: str, asc: bool) -> str:
    """Rank among non-null rows only; null rows → NULL (filled later)."""
    return f"CASE WHEN {col} IS NOT NULL THEN {_pct_rank_sql(col, asc)} END"


# ====================================================================
# RFM family — operators D1-D4, C6, E1, I2-I4, B7-B10, F1 (SURVEY §2)
# ====================================================================

_RFM_CUSTOMER_ORACLE = f"""
WITH fact AS (
    SELECT o_custkey AS custkey,
           o_orderkey AS id,
           CAST(o_orderdate AS DATE) AS d,
           CAST(round(o_totalprice * 100) AS BIGINT) AS amt
    FROM orders
),
mx AS (SELECT max(d) + 1 AS analysis_date FROM fact),
agg AS (
    SELECT custkey,
           CAST(date_diff('day', max(d), (SELECT analysis_date FROM mx))
               AS BIGINT) AS life_recency_days,
           count(DISTINCT id) AS life_frequency,
           sum(amt) AS life_mon_cents,
           CAST(date_diff('day',
                max(CASE WHEN d >= (SELECT analysis_date FROM mx) - 365
                         THEN d END),
                (SELECT analysis_date FROM mx)) AS BIGINT)
               AS short_recency_raw,
           count(DISTINCT CASE WHEN d >= (SELECT analysis_date FROM mx) - 365
                               THEN id END) AS short_freq_raw,
           sum(CASE WHEN d >= (SELECT analysis_date FROM mx) - 365 THEN amt END)
               AS short_mon_cents
    FROM fact
    GROUP BY custkey
),
norm AS (
    SELECT custkey, life_recency_days, life_frequency, life_mon_cents,
           short_recency_raw,
           CASE WHEN short_recency_raw IS NOT NULL THEN short_freq_raw END
               AS short_freq_n,
           short_mon_cents
    FROM agg
),
ranked AS (
    SELECT *,
           {_pct_rank_sql('life_recency_days', False)} AS life_r_rank,
           {_pct_rank_sql('life_frequency', True)} AS life_f_rank,
           {_pct_rank_sql('life_mon_cents', True)} AS life_m_rank,
           {_scoped_pct_rank_sql('short_recency_raw', False)} AS short_r_rank_n,
           {_scoped_pct_rank_sql('short_freq_n', True)} AS short_f_rank_n,
           {_scoped_pct_rank_sql('short_mon_cents', True)} AS short_m_rank_n
    FROM norm
),
filled AS (
    SELECT custkey, life_recency_days, life_frequency,
           life_mon_cents / 100.0 AS life_monetary,
           COALESCE(short_recency_raw, 9999) AS short_recency_days,
           COALESCE(short_freq_n, 0) AS short_frequency,
           COALESCE(short_mon_cents, 0) / 100.0 AS short_monetary,
           life_r_rank, life_f_rank, life_m_rank,
           COALESCE(short_r_rank_n, 0) AS short_r_rank,
           COALESCE(short_f_rank_n, 0) AS short_f_rank,
           COALESCE(short_m_rank_n, 0) AS short_m_rank
    FROM ranked
)
SELECT *,
       CASE
         WHEN life_m_rank >= 0.8 AND short_frequency > 0 THEN '核心商家 (Core)'
         WHEN life_m_rank >= 0.8 THEN '流失高價值 (Churned VIP)'
         WHEN short_frequency > 0 AND short_m_rank >= 0.8
             THEN '潛力新星 (Rising Star)'
         WHEN short_frequency > 0 THEN '一般活躍 (Active)'
         ELSE '沉睡商家 (Dormant)'
       END AS segment
FROM filled
"""


@query("rfm_customer_dual_window", _RFM_CUSTOMER_ORACLE)
def rfm_customer_dual_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer RFM with lifetime + trailing-365d windows in one pass.

    Re-expresses the reference's merchant-RFM lifecycle
    (db_to_RFManalysis.py:236-268: dual aggregate, left join, rank,
    fill, segment) over the `orders` fact, grouped by customer.
    Single shuffle (conditional aggregation), rank join is broadcast.
    """
    orders = load(spark, sf_dir, "orders")
    fact = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("id"),
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amt"),
    )
    res = rfm_ops.rfm_dual_window(
        fact, ["custkey"], date_col="d", id_col="id", amount_col="amt"
    )
    return res.select(
        F.col("custkey"),
        F.col("life_recency_days").cast("long").alias("life_recency_days"),
        F.col("life_frequency").cast("long").alias("life_frequency"),
        (F.col("life_monetary") / 100.0).alias("life_monetary"),
        F.col("short_recency_days").cast("long").alias("short_recency_days"),
        F.col("short_frequency").cast("long").alias("short_frequency"),
        (F.col("short_monetary") / 100.0).alias("short_monetary"),
        F.col("life_r_rank").cast("double"),
        F.col("life_f_rank").cast("double"),
        F.col("life_m_rank").cast("double"),
        F.col("short_r_rank").cast("double"),
        F.col("short_f_rank").cast("double"),
        F.col("short_m_rank").cast("double"),
        rfm_ops.label_merchant_segment().alias("segment"),
    )
