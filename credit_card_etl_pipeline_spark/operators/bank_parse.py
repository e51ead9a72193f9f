"""Bank-specific statement parsing (operators H7, H9, H5-variants).

Node-4 of the reference's per-bank pipeline (etl.py:205-254, 343-369):
E.Sun fused foreign-transaction fields, Cathay country/currency split,
CTBC / Hua Nan location+currency defaults.  All pure column
expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schema as S
from ..functions.cleanse import normalize_country_code

#: H7 (etl.py:214): merchant ⟨2+ spaces or tab⟩ place ⟨spaces⟩ MM/DD?
ESUN_FOREIGN_PATTERN = r"^(.*?)(?:\s{2,}|\t)(.*?)(?:\s+(\d{2}/\d{2}))?$"


def parse_esun_details(df: DataFrame) -> DataFrame:
    """H7 (etl.py:206-242) + the location copy step (etl.py:349-357).

    The reference strips the merchant, extracts (name, place,
    conversion-date) from rows where the fused pattern matches, fills
    ``Consumption_Place`` and then copies it into
    ``Merchant_Location``.  pandas ``str.extract`` group semantics: a
    non-matching row leaves every target untouched; optional group 3
    may be absent within a matching row.
    """
    merchant = F.trim(F.col(S.MERCHANT).cast("string"))
    matched = F.coalesce(merchant.rlike(ESUN_FOREIGN_PATTERN), F.lit(False))
    g1 = F.regexp_extract(merchant, ESUN_FOREIGN_PATTERN, 1)
    g2 = F.regexp_extract(merchant, ESUN_FOREIGN_PATTERN, 2)
    g3 = F.regexp_extract(merchant, ESUN_FOREIGN_PATTERN, 3)

    has_place = matched & (g2 != "")
    place = F.trim(g2)
    return df.withColumns(
        {
            S.MERCHANT: F.when(matched & (g1 != ""), F.trim(g1)).otherwise(merchant),
            S.CONSUMPTION_PLACE: F.when(has_place, place).otherwise(
                F.col(S.CONSUMPTION_PLACE)
            ),
            S.CONVERSION_DATE: F.when(matched & (g3 != ""), g3).otherwise(
                F.col(S.CONVERSION_DATE)
            ),
            # etl.py:354-357 — the "搬運工" copy into Merchant_Location.
            S.MERCHANT_LOCATION: F.when(has_place, place).otherwise(
                F.col(S.MERCHANT_LOCATION)
            ),
        }
    )


def parse_cube_details(df: DataFrame) -> DataFrame:
    """H9 (etl.py:245-254): ``消費地/幣別`` = ``'TW / TWD'`` → location
    (country-normalized) + currency; raw column dropped."""
    if S.RAW_COUNTRY_CURRENCY not in df.columns:
        return df
    raw = F.col(S.RAW_COUNTRY_CURRENCY).cast("string")
    parts = F.split(raw, " / ", 2)
    has = raw.isNotNull()
    return df.withColumns(
        {
            S.MERCHANT_LOCATION: F.when(
                has, normalize_country_code(F.trim(parts.getItem(0)))
            ).otherwise(F.col(S.MERCHANT_LOCATION)),
            S.CURRENCY_TYPE: F.when(
                has & (F.size(parts) >= 2), F.trim(parts.getItem(1))
            ).otherwise(F.col(S.CURRENCY_TYPE)),
        }
    ).drop(S.RAW_COUNTRY_CURRENCY)


def apply_bank_defaults(df: DataFrame, bank_id: str) -> DataFrame:
    """CTBC/HNCB null-fill defaults (etl.py:362-369)."""
    if bank_id == "ctbc_bank":
        return df.withColumns(
            {
                S.MERCHANT_LOCATION: F.coalesce(
                    F.col(S.MERCHANT_LOCATION), F.lit("TW")
                ),
                S.CURRENCY_TYPE: F.coalesce(F.col(S.CURRENCY_TYPE), F.lit("TWD")),
            }
        )
    if bank_id == "hncb_bank":
        return df.withColumn(
            S.MERCHANT_LOCATION,
            F.coalesce(F.col(S.MERCHANT_LOCATION), F.lit("TW")),
        )
    return df


def parse_bank_specific(df: DataFrame, bank_id: str) -> DataFrame:
    """Dispatch Node-4 per bank (etl.py:343-369)."""
    if bank_id == "esun_bank":
        return parse_esun_details(df)
    if bank_id == "cube_bank":
        return parse_cube_details(df)
    return apply_bank_defaults(df, bank_id)
