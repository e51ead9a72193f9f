"""Card-info extraction via ordered forward-fill (operators E2, H8, B11).

Re-expression of the reference's ``extract_card_info`` (etl.py:155-203):
master header rows (玉山 ``卡號：…（卡別－正卡）`` / 華南
``卡別************1234``) are tagged, their text forward-filled down to
the detail rows below them **in file order**, card number / card type
regex-extracted from the filled text, payment/transfer rows force-cleared
(etl.py:190-195), and the master rows dropped (B11).

Spark has no implicit row order (SURVEY §4 trap 2), so the fill runs
over an **explicit ingest-order window**: ``partitionBy(file)
orderBy(line_pos)`` with ``last(..., ignorenulls=True)`` and an
unbounded-preceding frame.  Statement files are KB-sized, so one
partition per file is the natural (and correct) granularity; thousands
of files parallelize across executors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import schema as S
from ..functions.predicates import s


@dataclass(frozen=True)
class CardMasterPattern:
    """Per-bank master-row spec (etl.py:161-172)."""

    trigger: str  # regex marking a master row
    card_no: str  # extraction regex, group 1 = last-4 digits
    card_type: str | None = None  # extraction regex, group 1 = card name


#: Reference patterns (etl.py:161-172).
CARD_MASTER_PATTERNS: dict[str, CardMasterPattern] = {
    "esun_bank": CardMasterPattern(
        trigger="卡號：",
        card_no=r"(\d{4})（",
        card_type=r"（(.*?)－?(?:正卡|附卡)）",
    ),
    "hncb_bank": CardMasterPattern(
        trigger=r"\*{12}",
        card_no=r"\*{12}(\d{4})",
        card_type=r"^(.*?)\*{12}",
    ),
}


def _extract_or_null(col: F.Column, pattern: str) -> F.Column:
    """pandas ``str.extract`` semantics: no match → null (Spark's
    ``regexp_extract`` yields '' for both no-match and empty match)."""
    hit = F.regexp_extract(col, pattern, 1)
    return F.when(col.rlike(pattern), hit).otherwise(F.lit(None).cast("string"))


def extract_card_info(
    df: DataFrame,
    bank_id: str,
    *,
    file_col: str = "path",
    order_col: str = "pos",
) -> DataFrame:
    """E2+H8+B11 for one bank's frame (etl.py:155-203).

    No-op for banks without a master-row convention, mirroring the
    reference's target_banks guard (etl.py:156-158).
    """
    cfg = CARD_MASTER_PATTERNS.get(bank_id)
    if cfg is None or S.MERCHANT not in df.columns:
        return df

    is_master = F.coalesce(s(S.MERCHANT).rlike(cfg.trigger), F.lit(False))
    w = (
        Window.partitionBy(file_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(
        F.when(is_master, F.col(S.MERCHANT)), ignorenulls=True
    ).over(w)

    card_no = _extract_or_null(filled, cfg.card_no)
    card_type = (
        _extract_or_null(filled, cfg.card_type) if cfg.card_type else None
    )

    # Payment/transfer rows must not inherit a card (etl.py:190-195).
    is_payment = F.coalesce(s(S.MERCHANT).rlike("繳款|轉帳"), F.lit(False))

    updates = {
        S.CARD_NO: F.when(is_payment, F.lit(None).cast("string")).otherwise(card_no)
    }
    if card_type is not None:
        updates[S.CARD_TYPE] = F.when(
            is_payment, F.lit(None).cast("string")
        ).otherwise(card_type)
    return df.withColumns(updates).where(~is_master)  # B11
