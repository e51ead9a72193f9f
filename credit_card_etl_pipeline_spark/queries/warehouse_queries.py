"""Warehouse query — operators H13 + B5 over the refined surface.

Proves surrogate-key stability across engines: the Spark
``md5(concat(...))`` of the canonicalized key fields must equal DuckDB's
md5 over the independently-derived refined rows (the refine oracle is
reused as a subquery).  Duplicate hash inputs are kept as duplicate
rows — the reference's dedup-free contract (FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..warehouse import to_warehouse
from . import query
from .refine_queries import _REFINE_ORACLE, REFINE_CONFIG, synth_canonical
from ..plans.refine import refine

_WAREHOUSE_ORACLE = f"""
WITH refined AS ({_REFINE_ORACLE})
SELECT
  md5(
    coalesce(strftime("Transaction_Date", '%Y-%m-%d'), '')
    || coalesce(trim("Merchant"), '')
    || coalesce(trim("Card_No"), '')
    || coalesce(CAST("Payment_Amount" AS VARCHAR), '')
    || coalesce(trim("Transaction_Type"), '')
  ) AS transaction_id,
  "Transaction_Date" AS transaction_date,
  "Bank_Name" AS bank_name,
  "Card_Type" AS card_name,
  "Card_No" AS card_no,
  "Merchant" AS merchant_name,
  "Transaction_Type" AS transaction_type,
  "Payment_Amount" AS payment_amount
FROM refined
"""


@query("warehouse_surrogate_key", _WAREHOUSE_ORACLE)
def warehouse_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H13+B5: refined rows → snake_case warehouse projection with the
    md5 surrogate key; hash parity checked value-for-value."""
    refined = refine(synth_canonical(spark, sf_dir), REFINE_CONFIG)
    wh = to_warehouse(refined)
    return wh.select(
        "transaction_id",
        "transaction_date",
        "bank_name",
        "card_name",
        "card_no",
        "merchant_name",
        "transaction_type",
        "payment_amount",
    )
