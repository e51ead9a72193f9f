"""Canonical transaction schema and null discipline.

The reference unifies every bank statement into 17 canonical columns
(reference: etl.py:13-29) carried as pandas ``str``/``float`` dtypes
(refine.py:34-50).  The engine holds the same surface but with honest
Spark types: real ``DateType`` dates in flight (the reference serializes
dates back to strings only because its resting format is CSV), doubles
for money, and real SQL ``null`` instead of the reference's
``''``/``'nan'``/``NaN`` trio (refine.py:393-395) — normalization to
empty-string happens only at CSV sinks, never internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical column names (reference: etl.py:13-29).
TRANSACTION_DATE = "Transaction_Date"
POSTING_DATE = "Posting_Date"
MERCHANT = "Merchant"
MERCHANT_LOCATION = "Merchant_Location"
CONSUMPTION_PLACE = "Consumption_Place"
CONVERSION_DATE = "Conversion_Date"
CURRENCY_TYPE = "Currency_Type"
AMOUNT = "Amount"
CURRENCY_AMOUNT = "Currency_Amount"
PAYMENT_AMOUNT = "Payment_Amount"
PAYMENT_CURRENCY = "Payment_Currency"
CARD_NO = "Card_No"
CARD_TYPE = "Card_Type"
TRANSACTION_TYPE = "Transaction_Type"
MOBILE_PAYMENT = "Mobile_Payment"
BANK_NAME = "Bank_Name"
RAW_COUNTRY_CURRENCY = "Raw_Country_Currency"

#: Ordered canonical projection (reference: etl.py:487-494).
CANONICAL_COLUMNS: list[str] = [
    TRANSACTION_DATE,
    POSTING_DATE,
    BANK_NAME,
    CARD_TYPE,
    CARD_NO,
    MERCHANT,
    MERCHANT_LOCATION,
    CONSUMPTION_PLACE,
    CONVERSION_DATE,
    CURRENCY_TYPE,
    CURRENCY_AMOUNT,
    AMOUNT,
    PAYMENT_AMOUNT,
    PAYMENT_CURRENCY,
    TRANSACTION_TYPE,
    MOBILE_PAYMENT,
    RAW_COUNTRY_CURRENCY,
]

#: Extract-stage output order (reference ``desired_cols``,
#: etl.py:487-494) — the `result_all_banks` surface.
ETL_OUTPUT_COLUMNS: list[str] = [
    TRANSACTION_DATE,
    POSTING_DATE,
    MERCHANT,
    MERCHANT_LOCATION,
    CONSUMPTION_PLACE,
    CURRENCY_TYPE,
    CONVERSION_DATE,
    AMOUNT,
    CURRENCY_AMOUNT,
    PAYMENT_AMOUNT,
    PAYMENT_CURRENCY,
    TRANSACTION_TYPE,
    MOBILE_PAYMENT,
    CARD_TYPE,
    CARD_NO,
    BANK_NAME,
]

#: Refined-output projection, matching the reference's ``cols_order``
#: exactly (refine.py:422-431): 15 columns, no Amount, no
#: Raw_Country_Currency, dates → cards → merchant → type → money.
REFINED_COLUMNS: list[str] = [
    TRANSACTION_DATE,
    POSTING_DATE,
    BANK_NAME,
    CARD_TYPE,
    CARD_NO,
    MERCHANT,
    MERCHANT_LOCATION,
    CONSUMPTION_PLACE,
    CONVERSION_DATE,
    TRANSACTION_TYPE,
    MOBILE_PAYMENT,
    CURRENCY_TYPE,
    CURRENCY_AMOUNT,
    PAYMENT_CURRENCY,
    PAYMENT_AMOUNT,
]

_DATE_COLUMNS = {TRANSACTION_DATE, POSTING_DATE, CONVERSION_DATE}
_DOUBLE_COLUMNS = {AMOUNT, CURRENCY_AMOUNT, PAYMENT_AMOUNT}


def spark_type_for(column: str) -> T.DataType:
    if column in _DATE_COLUMNS:
        return T.DateType()
    if column in _DOUBLE_COLUMNS:
        return T.DoubleType()
    return T.StringType()


#: The canonical StructType for the unified fact (in flight / at rest as
#: parquet).  Dtype intent mirrors refine.py:34-50 with honest types.
CANONICAL_SCHEMA = T.StructType(
    [T.StructField(c, spark_type_for(c), True) for c in CANONICAL_COLUMNS]
)

#: snake_case rename used by the warehouse layer (reference:
#: load_to_db.py:81-101; Card_Type→card_name, Merchant→merchant_name).
WAREHOUSE_RENAME: dict[str, str] = {
    TRANSACTION_DATE: "transaction_date",
    POSTING_DATE: "posting_date",
    CONVERSION_DATE: "conversion_date",
    BANK_NAME: "bank_name",
    CARD_TYPE: "card_name",
    CARD_NO: "card_no",
    MERCHANT: "merchant_name",
    MERCHANT_LOCATION: "merchant_location",
    CONSUMPTION_PLACE: "consumption_place",
    TRANSACTION_TYPE: "transaction_type",
    MOBILE_PAYMENT: "mobile_payment",
    CURRENCY_AMOUNT: "currency_amount",
    PAYMENT_AMOUNT: "payment_amount",
    CURRENCY_TYPE: "currency_type",
    PAYMENT_CURRENCY: "payment_currency",
}


def conform(df: DataFrame) -> DataFrame:
    """Project ``df`` onto the canonical schema (operator B3 + B4).

    Missing canonical columns are materialized as typed nulls
    (reference materializes ``''``/``NaN``, etl.py:333-335 /
    refine.py:388-391 — we keep real nulls); present string columns are
    trimmed and the reference's CSV artifacts (``''``, ``'nan'``) are
    normalized to null (refine.py:393-395, H17).
    """
    cols = []
    for c in CANONICAL_COLUMNS:
        t = spark_type_for(c)
        if c not in df.columns:
            cols.append(F.lit(None).cast(t).alias(c))
        elif isinstance(t, T.StringType):
            trimmed = F.trim(F.col(c).cast("string"))
            cols.append(
                F.when(trimmed == "", None)
                .when(F.lower(trimmed) == "nan", None)
                .otherwise(trimmed)
                .alias(c)
            )
        else:
            cols.append(F.col(c).cast(t).alias(c))
    return df.select(*cols)
