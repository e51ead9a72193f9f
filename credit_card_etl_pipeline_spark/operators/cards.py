"""Card consolidation (operators C1, H10).

Re-expression of the reference's ``apply_card_mapping``
(refine.py:114-174) and ``cleanup_cathay_remaining`` (refine.py:176-182).

Reference semantics preserved exactly:

* Matching keys are **snapshotted before any rule applies**
  (refine.py:139-140): card number with spaces removed, mobile-payment
  tag trimmed — later rules never see an earlier rule's writes (a true
  join, not a cascade — SURVEY §4 trap 4).
* Three match modes per rule (refine.py:154-166): dual-number exact
  (``'NNNN/NNNN'``), compound card+mobile, plain card.
* Rules iterate in **file order** and every matching rule writes, so for
  each output field the LAST matching rule with a non-empty value wins.
* A rule writes a field only when its value is non-empty.

Compilation: rule tables are KB-sized (tens of rows), so each output
field compiles to a single ``coalesce(when(match_n, lit), …,
when(match_1, lit), existing)`` expression evaluated in reverse rule
order — pure JVM codegen, zero shuffles, zero joins.  If the rule corpus
ever grows past ~1k rows, swap the compiler for a broadcast left join on
the snapshot keys with ``row_number`` picking the last match; semantics
are identical.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schema as S
from ..functions.predicates import s

#: cards.csv column names (refine.py:121-125).
CARD_NAME_COL = "對應卡片"
CARD_NO_COL = "卡號"
MOBILE_TAG_COL = "行動支付標籤"
PREFIX_COL = "加在消費明細摘要前方"
REPLACE_NO_COL = "卡號代換"

PAYMENT_PREFIX = "payment_prefix"


def _rule_match(rule: dict[str, Any], card_key: Column, mobile_key: Column) -> Column:
    target_card = (rule.get(CARD_NO_COL) or "").replace(" ", "")
    target_mobile = (rule.get(MOBILE_TAG_COL) or "").strip()
    if "/" in target_card:
        return card_key == target_card
    if target_mobile:
        return (card_key == target_card) & (mobile_key == target_mobile)
    return card_key == target_card


def apply_card_mapping(df: DataFrame, rules: list[dict[str, Any]]) -> DataFrame:
    """C1: assign Card_Type / Mobile_Payment / payment_prefix / Card_No
    from the card rule table; adds the ``payment_prefix`` working column.
    """
    rules = [r for r in rules if (r.get(CARD_NO_COL) or "").replace(" ", "")]

    # Snapshot keys (refine.py:139-140): evaluated against the INPUT
    # columns only — expression trees below reference these, not the
    # updated values.
    card_key = F.regexp_replace(s(S.CARD_NO), " ", "")
    mobile_key = F.trim(s(S.MOBILE_PAYMENT))

    out_fields = [
        (CARD_NAME_COL, S.CARD_TYPE),
        (MOBILE_TAG_COL, S.MOBILE_PAYMENT),
        (PREFIX_COL, PAYMENT_PREFIX),
        (REPLACE_NO_COL, S.CARD_NO),
    ]
    if PAYMENT_PREFIX not in df.columns:
        df = df.withColumn(PAYMENT_PREFIX, F.lit(None).cast("string"))

    assignments: dict[str, Column] = {}
    for rule_col, target in out_fields:
        expr: Column = F.col(target)
        # Forward iteration nests later rules OUTERMOST, so the last
        # matching rule with a non-empty value is evaluated first —
        # i.e. last-match-wins, as in the reference's loop.
        for rule in rules:
            value = (rule.get(rule_col) or "").strip()
            if not value:
                continue
            expr = F.when(_rule_match(rule, card_key, mobile_key), F.lit(value)).otherwise(expr)
        assignments[target] = expr
    return df.withColumns(assignments)


def cleanup_cathay_remaining(df: DataFrame) -> DataFrame:
    """H10: unresolved Cathay dual card numbers keep the first segment
    (refine.py:176-182)."""
    mask = (s(S.BANK_NAME) == "cube_bank") & F.coalesce(
        F.col(S.CARD_NO).contains("/"), F.lit(False)
    )
    return df.withColumn(
        S.CARD_NO,
        F.when(mask, F.trim(F.split(F.col(S.CARD_NO), "/", 2).getItem(0))).otherwise(
            F.col(S.CARD_NO)
        ),
    )
