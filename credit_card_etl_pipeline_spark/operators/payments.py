"""Third-party payment identification (operators C2, C5).

C2 — ``identify_third_party_payment`` (refine.py:184-202): rules sorted
priority-descending (stable); for each rule, rows whose Merchant matches
``Pattern`` AND whose Mobile_Payment is still blank get
``payment_prefix = Prefix_Label`` and ``Mobile_Payment = Category``.
Because a match fills Mobile_Payment, later rules can't re-match — i.e.
first-match-wins over the sorted rule list.  Compiled here as one
``when`` chain in priority order, guarded by the row's ORIGINAL blank
test (equivalent: a row matched by any rule takes the first such rule).

C5 — ``identify_payment_method`` (db_to_Payment_RFM.py:34-84): maps a
merchant-name *prefix* back to the payment-method category for the
payment-RFM job.  Only rules with ``Priority >= 20`` participate
(db_to_Payment_RFM.py:21,52); prefixes are tried longest-first
(db_to_Payment_RFM.py:66) so ``LinePay－`` beats ``Line－``; no match →
``實體卡/其他``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schema as S
from ..functions.predicates import blank, contains_cs
from .cards import PAYMENT_PREFIX

FALLBACK_METHOD = "實體卡/其他"


def identify_third_party_payment(
    df: DataFrame, rules: list[dict[str, Any]]
) -> DataFrame:
    """C2: tag mobile-payment category + merchant prefix, FMW by priority."""
    if not rules:
        return df
    if PAYMENT_PREFIX not in df.columns:
        df = df.withColumn(PAYMENT_PREFIX, F.lit(None).cast("string"))

    guard = blank(S.MOBILE_PAYMENT)
    prefix_expr: Column = F.col(PAYMENT_PREFIX)
    mobile_expr: Column = F.col(S.MOBILE_PAYMENT)
    # Reverse nesting → first (highest-priority) rule outermost = FMW.
    for rule in reversed(rules):
        pattern = rule.get("Pattern")
        if not pattern:
            continue
        cond = guard & contains_cs(S.MERCHANT, pattern)
        prefix_expr = F.when(cond, F.lit(rule.get("Prefix_Label"))).otherwise(prefix_expr)
        mobile_expr = F.when(cond, F.lit(rule.get("Category"))).otherwise(mobile_expr)
    return df.withColumns({PAYMENT_PREFIX: prefix_expr, S.MOBILE_PAYMENT: mobile_expr})


def _c5_priority(r: dict[str, Any]) -> float | None:
    """The reference gates C5 with pandas ``Priority >= 20`` where NaN
    compares False (db_to_Payment_RFM.py:52) — so a missing/unparseable
    priority EXCLUDES the rule, unlike load_rule_csv's 999 default.
    Prefer the raw pre-coercion value when the loader preserved it."""
    raw = r.get("Priority_raw", r.get("Priority"))
    try:
        v = float(raw)
        return None if v != v else v  # NaN → excluded
    except (TypeError, ValueError):
        return None


def payment_method_prefixes(rules: list[dict[str, Any]]) -> list[tuple[str, str]]:
    """C5 rule prep: ``(prefix, category)`` for Priority ≥ 20, sorted by
    prefix length descending (stable)."""
    prefix_map: dict[str, str] = {}
    for r in rules:
        prefix = (r.get("Prefix_Label") or "").strip()
        priority = _c5_priority(r)
        if priority is not None and priority >= 20 and prefix and prefix.lower() != "nan":
            # dict assignment: duplicate prefixes keep the LAST category,
            # matching the reference's prefix_map construction.
            prefix_map[prefix] = (r.get("Category") or "").strip()
    return sorted(prefix_map.items(), key=lambda pc: -len(pc[0]))


def identify_payment_method(
    df: DataFrame,
    rules: list[dict[str, Any]],
    *,
    merchant_col: str = "merchant_name",
    out: str = "Payment_Method",
) -> DataFrame:
    """C5: longest-prefix → category lookup with fallback bucket."""
    name = F.trim(F.col(merchant_col))
    expr: Column = F.lit(FALLBACK_METHOD)
    for prefix, category in reversed(payment_method_prefixes(rules)):
        expr = F.when(
            F.coalesce(name.startswith(prefix), F.lit(False)), F.lit(category)
        ).otherwise(expr)
    return df.withColumn(out, expr)
