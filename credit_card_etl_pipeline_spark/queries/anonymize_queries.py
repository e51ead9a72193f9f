"""Anonymizer-harness queries — operators C7, H14, H15, H16, G2.

The reference's mock-data engine made deterministic: date shifts,
md5-stream noise, sorted-order card masking, and the keyword-stratified
sampler all recompute identically in DuckDB, so even the "random"
surface is value-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..anonymize import inject_noise, mask_cards, shift_dates, stratified_sample
from ..functions.hashing import md5_int60_sql
from . import load, query
from .rfm_queries import SYNTH_FACT_SQL, synth_transactions

# ------------------------------------------------------------------
# C7 + H14 + H15
# ------------------------------------------------------------------


def _synth_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    card = (
        F.when(c % 4 == 0, "1111")
        .when(c % 4 == 1, "2222")
        .when(c % 4 == 2, "3333")
        .otherwise(F.lit(None).cast("string"))
    )
    return orders.select(
        k.alias("id"),
        F.to_date("o_orderdate").alias("d"),
        card.alias("Card_No"),
        (F.round(F.col("o_totalprice") * 100) / 100.0).alias("amount"),
    )


_MASK_ORACLE = f"""
WITH raw AS (
    SELECT o_orderkey AS id,
           CAST(o_orderdate AS DATE) AS d,
           CASE (o_custkey % 4) WHEN 0 THEN '1111' WHEN 1 THEN '2222'
                WHEN 2 THEN '3333' ELSE NULL END AS card,
           round(o_totalprice * 100) / 100.0 AS amount
    FROM orders
),
mx AS (SELECT max(d) AS mxd FROM raw),
shifted AS (
    -- exact integer-cents noise (half-up via +5e5 then integer div):
    -- identical arithmetic to inject_noise; a float-factor round()
    -- diverged from Spark by one cent at .xx5 boundaries (sf1 sweep)
    SELECT id,
           d + CAST(DATE '2023-12-25' - (SELECT mxd FROM mx) AS INTEGER) AS d,
           card,
           (CAST(round(amount * 100) AS BIGINT)
              * (950000 + ({md5_int60_sql("CAST(id AS VARCHAR) || ':noise:amount'")} % 100000))
              + 500000) // 1000000 / 100.0 AS amount
    FROM raw
),
cards AS (SELECT DISTINCT card FROM raw WHERE card IS NOT NULL),
cmap AS (
    SELECT card,
           CASE WHEN card = '2222' THEN '****-****-****-8888'
                ELSE '****-****-****-' || CAST(
                    1000 * row_number() OVER (PARTITION BY (card = '2222')
                                              ORDER BY card) AS VARCHAR)
           END AS fake
    FROM cards
)
SELECT s.id, s.d AS "Transaction_Date",
       COALESCE(m.fake, s.card) AS "Card_No",
       s.amount
FROM shifted s LEFT JOIN cmap m ON m.card = s.card
"""


@query("anonymize_mask_shift_noise", _MASK_ORACLE)
def anonymize_mask_shift_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 broadcast masking join (custom last-4 override + sorted auto
    counter), H14 anchor-preserving date shift, H15 deterministic
    [0.95,1.05) noise — the full anonymizer column surface."""
    df = _synth_cards(spark, sf_dir)
    df = shift_dates(df, ["d"], anchor_col="d")
    df = inject_noise(df, ["amount"], id_col="id")
    df, _ = mask_cards(df, card_col="Card_No", custom_map={"2222": "8888"})
    return df.select(
        "id",
        F.col("d").alias("Transaction_Date"),
        "Card_No",
        "amount",
    )


# ------------------------------------------------------------------
# H16 + G2
# ------------------------------------------------------------------

_SAMPLE_KEYWORDS = ["linepay", "街口", "merchant-7"]
_SAMPLE_N = 30


def _kw_block(kw: str) -> str:
    order = "md5(CAST(transaction_id AS VARCHAR) || ':sample')"
    return f"""
    SELECT transaction_id, merchant_name FROM (
        SELECT transaction_id, merchant_name,
               row_number() OVER (ORDER BY {order}, transaction_id) AS rn
        FROM fact WHERE contains(lower(merchant_name), '{kw}')
    ) WHERE rn <= 2
    """


_SAMPLE_ORACLE = f"""
WITH fact AS ({SYNTH_FACT_SQL}),
rem AS (
    SELECT {_SAMPLE_N} - (
        {" + ".join(f"(SELECT least(2, count(*)) FROM fact WHERE contains(lower(merchant_name), '{kw}'))" for kw in _SAMPLE_KEYWORDS)}
    ) AS r
),
pool AS (
    {" UNION ALL ".join(_kw_block(kw) for kw in _SAMPLE_KEYWORDS)}
    UNION ALL
    SELECT transaction_id, merchant_name FROM (
        SELECT transaction_id, merchant_name,
               row_number() OVER (
                   ORDER BY md5(CAST(transaction_id AS VARCHAR) || ':sample'),
                            transaction_id) AS rn
        FROM fact
    ) WHERE rn <= (SELECT r FROM rem)
)
SELECT DISTINCT transaction_id, merchant_name FROM pool
"""


@query("mock_stratified_sample", _SAMPLE_ORACLE)
def mock_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H16+G2: keyword-stratified sample (≤2 per keyword, deterministic
    shuffle) + md5-ordered remainder to n=30, unioned + de-duplicated."""
    fact = synth_transactions(spark, sf_dir)
    out = stratified_sample(
        fact,
        merchant_col="merchant_name",
        id_col="transaction_id",
        keywords=_SAMPLE_KEYWORDS,
        per_keyword=2,
        n=_SAMPLE_N,
    )
    return out.select("transaction_id", "merchant_name")
