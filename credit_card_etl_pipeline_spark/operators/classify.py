"""Transaction-type classification (operator I1, refine.py:258-364).

A strict precedence cascade — each stage fires only where the type is
still unassigned — with column-clearing side effects:

1. 繳款 (payment): merchant hits a payment keyword AND NOT the
   代收/手續費/運費 exception (refine.py:277); clears Card_Type,
   Mobile_Payment, Consumption_Place, payment_prefix.
2. 折抵 (credit): credit keyword; clears Mobile_Payment, payment_prefix.
3. 退刷 (refund): Payment_Amount < 0.
4. 各項費用 (fees): fee keyword; clears Mobile_Payment, payment_prefix.
5. 驗證/零元: Payment_Amount == 0.
6. 交易 (purchase): Payment_Amount > 0, with foreign sub-classification
   (refine.py:318-362): Merchant_Location ≠ 'TW' →
   currencies differ ⇒ 一般國外交易; same and TWD ⇒ 台幣跨境交易
   (also syncs Currency_Amount := Payment_Amount); same and non-TWD ⇒
   一般雙幣交易.

Everything compiles to one ``when`` cascade per output column — the
CASE WHEN precedence IS the stage precedence, evaluated in a single
codegen'd projection.  Keyword comparisons are case-insensitive
(pandas ``case=False``); empty keyword lists become the never-matching
``(?!)`` pattern (refine.py:268-270).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schema as S
from ..functions.predicates import blank, contains_ci, s
from ..sources.configs import TransactionTypeKeywords
from .cards import PAYMENT_PREFIX

TYPE_PAYMENT = "繳款"
TYPE_CREDIT = "折抵"
TYPE_REFUND = "退刷"
TYPE_FEE = "各項費用"
TYPE_ZERO = "驗證/零元"
TYPE_PURCHASE = "交易"
TYPE_FOREIGN = "一般國外交易"
TYPE_TWD_CROSS_BORDER = "台幣跨境交易"
TYPE_DUAL_CURRENCY = "一般雙幣交易"

#: merchants hitting a payment keyword but also this pattern are NOT
#: payments (collection agents / fees / shipping — refine.py:277).
PAYMENT_EXCEPTION_PATTERN = "代收|手續費|運費"


def classify_transaction_type(
    df: DataFrame, keywords: TransactionTypeKeywords
) -> DataFrame:
    payment_pat = TransactionTypeKeywords.pattern_of(keywords.payment_keywords)
    credit_pat = TransactionTypeKeywords.pattern_of(keywords.credit_keywords)
    fee_pat = TransactionTypeKeywords.pattern_of(keywords.fee_keywords)

    untyped = blank(S.TRANSACTION_TYPE)
    amt = F.col(S.PAYMENT_AMOUNT)

    is_payment = (
        untyped
        & contains_ci(S.MERCHANT, payment_pat)
        & ~contains_ci(S.MERCHANT, PAYMENT_EXCEPTION_PATTERN)
    )
    is_credit = untyped & ~is_payment & contains_ci(S.MERCHANT, credit_pat)
    prior = is_payment | is_credit
    is_refund = untyped & ~prior & (amt < 0)
    prior = prior | is_refund
    is_fee = untyped & ~prior & contains_ci(S.MERCHANT, fee_pat)
    prior = prior | is_fee
    is_zero = untyped & ~prior & (amt == 0)
    prior = prior | is_zero
    is_general = untyped & ~prior & (amt > 0)

    # Foreign sub-classification within the general stage.  The
    # reference compares the pandas ``''``-convention values
    # (refine.py:330-345): a blank location counts as foreign, blank
    # currencies compare as empty strings.
    is_foreign = is_general & (s(S.MERCHANT_LOCATION) != "TW")
    currencies_differ = s(S.CURRENCY_TYPE) != s(S.PAYMENT_CURRENCY)
    is_foreign_diff = is_foreign & currencies_differ
    is_twd_cross = is_foreign & ~currencies_differ & (s(S.CURRENCY_TYPE) == "TWD")
    is_dual = is_foreign & ~currencies_differ & (s(S.CURRENCY_TYPE) != "TWD")

    new_type = (
        F.when(is_payment, TYPE_PAYMENT)
        .when(is_credit, TYPE_CREDIT)
        .when(is_refund, TYPE_REFUND)
        .when(is_fee, TYPE_FEE)
        .when(is_zero, TYPE_ZERO)
        .when(is_foreign_diff, TYPE_FOREIGN)
        .when(is_twd_cross, TYPE_TWD_CROSS_BORDER)
        .when(is_dual, TYPE_DUAL_CURRENCY)
        .when(is_general, TYPE_PURCHASE)
        .otherwise(F.col(S.TRANSACTION_TYPE))
    )

    clear_for_payment = [
        S.CARD_TYPE,
        S.MOBILE_PAYMENT,
        S.CONSUMPTION_PLACE,
        PAYMENT_PREFIX,
    ]
    clear_for_credit_fee = [S.MOBILE_PAYMENT, PAYMENT_PREFIX]

    updates = {S.TRANSACTION_TYPE: new_type}
    for c in set(clear_for_payment) | set(clear_for_credit_fee):
        if c not in df.columns:
            continue
        cond = is_payment if c in clear_for_payment else F.lit(False)
        if c in clear_for_credit_fee:
            cond = cond | is_credit | is_fee
        updates[c] = F.when(cond, F.lit(None).cast("string")).otherwise(F.col(c))

    # 台幣跨境: consumption amount = settlement amount (refine.py:353-357).
    updates[S.CURRENCY_AMOUNT] = F.when(is_twd_cross, amt).otherwise(
        F.col(S.CURRENCY_AMOUNT)
    )
    return df.withColumns(updates)
