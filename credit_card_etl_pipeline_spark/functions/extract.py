"""Business-specific extraction/stitching expressions (H11, H12).

Pure column expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schema as S
from ..functions.predicates import contains_ci, not_blank, s
from ..operators.cards import PAYMENT_PREFIX

#: H11 (refine.py:213) — Java-regex form of the reference's named-group
#: pattern (Python ``(?P<name>…)`` → plain groups; group 2 = amount).
EPOINT_PATTERN = r"使用e point\s*([\d,]+)\s*點折現金\s*([\d,]+)\s*元"


def process_esun_epoint(df: DataFrame) -> DataFrame:
    """H11: E.Sun e.Point credit rows — back-fill the settlement amount
    as a negative TWD value (refine.py:208-226).

    The candidate filter is case-insensitive (``case=False``) but the
    extraction itself is case-sensitive (``str.extract`` with no flags),
    so '使用E POINT…' rows are candidates that extract nothing — both
    behaviours preserved.
    """
    amount_str = F.regexp_extract(s(S.MERCHANT), EPOINT_PATTERN, 2)
    applies = (
        (s(S.BANK_NAME) == "esun_bank")
        & contains_ci(S.MERCHANT, "使用e point")
        & (amount_str != "")
    )
    neg_amount = -F.regexp_replace(amount_str, ",", "").cast("double")
    return df.withColumns(
        {
            S.PAYMENT_AMOUNT: F.when(applies, neg_amount).otherwise(
                F.col(S.PAYMENT_AMOUNT)
            ),
            S.PAYMENT_CURRENCY: F.when(applies, F.lit("TWD")).otherwise(
                F.col(S.PAYMENT_CURRENCY)
            ),
        }
    )


def apply_final_prefixes(df: DataFrame) -> DataFrame:
    """H12: stitch the payment prefix onto the merchant name and drop
    the working column (refine.py:247-256)."""
    if PAYMENT_PREFIX not in df.columns:
        return df
    stitched = F.when(
        not_blank(PAYMENT_PREFIX),
        F.concat(F.col(PAYMENT_PREFIX), s(S.MERCHANT)),
    ).otherwise(F.col(S.MERCHANT))
    return df.withColumn(S.MERCHANT, stitched).drop(PAYMENT_PREFIX)
