"""Refine-pipeline query — operators C1, C2, C3, H10, H11, H12, I1,
B3/B4, H17 exercised end-to-end through ``plans.refine.refine``.

The input is a 17-column canonical fact synthesized deterministically
from ``orders`` (scenario selector ``o_orderkey % 20`` routes rows
through every pipeline path: card rules incl. dual-number /
compound-key / last-match-wins, Cathay dual-card cleanup, third-party
payment tagging incl. the blank-mobile guard, e.Point extraction,
sequential merchant regex re-matching, the full I1 classification
cascade with its column-clearing side effects, and final prefix
stitching).  The DuckDB oracle re-implements the REFERENCE semantics
(refine.py:370-433) stage by stage in SQL — an independent derivation,
not a port of the Spark expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schema as S
from ..plans.refine import RefineConfig, refine
from ..sources.configs import TransactionTypeKeywords
from . import load, query

# ---------------------------------------------------------------
# In-code rule corpus (the reference's config directory, pinned).
# ---------------------------------------------------------------

#: C1 cards.csv rules (refine.py:121-125 schema).  Rules 1+4 overlap on
#: card '1234' → last-match-wins; rule 2 is dual-number exact with a
#: replacement card number; rule 3 is a compound card+mobile key.
CARD_RULES: list[dict[str, str]] = [
    {"對應卡片": "Gogo卡", "卡號": "1234"},
    {"對應卡片": "CUBE卡", "卡號": "5678/9012", "卡號代換": "5678"},
    {
        "對應卡片": "U卡ApplePay",
        "卡號": "1111",
        "行動支付標籤": "Apple Pay",
        "加在消費明細摘要前方": "ApplePay－",
    },
    {"對應卡片": "Gogo卡v2", "卡號": "1234"},
]

#: C2 payment_gateway.csv rules, priority-descending.
REFINE_PAYMENT_RULES: list[dict[str, str]] = [
    {"Pattern": "^LINEPAY\\*", "Category": "Line Pay", "Prefix_Label": "LinePay－", "Priority": "30"},
    {"Pattern": "悠遊付", "Category": "悠遊付", "Prefix_Label": "悠遊付－", "Priority": "20"},
]

#: C3 merchants regex rules, priority-descending.  Rules 1→2 exercise
#: the sequential re-matching cascade (SURVEY §4 trap 3); rule 4 has an
#: empty Replacement and must be skipped (refine.py:236).
MERCHANT_REGEX_RULES: list[dict[str, str]] = [
    {"Pattern": "^UBER\\s*EATS", "Replacement": "UberEats", "Priority": "50"},
    {"Pattern": "^UberEats$", "Replacement": "優食外送", "Priority": "40"},
    {"Pattern": "STARBUCKS|星巴克", "Replacement": "星巴克", "Priority": "30"},
    {"Pattern": "^MERCHANT-1$", "Replacement": "", "Priority": "10"},
]

REFINE_KEYWORDS = TransactionTypeKeywords(
    payment_keywords=["信用卡款", "繳款"],
    credit_keywords=["刷卡金回饋", "折抵"],
    fee_keywords=["年費", "手續費"],
)

REFINE_CONFIG = RefineConfig(
    card_rules=CARD_RULES,
    payment_rules=REFINE_PAYMENT_RULES,
    merchant_rules=MERCHANT_REGEX_RULES,
    keywords=REFINE_KEYWORDS,
)


# ---------------------------------------------------------------
# Synthetic canonical fact (Spark + SQL twins)
# ---------------------------------------------------------------

def synth_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """17-column canonical fact with one scenario per ``o_orderkey%20``."""
    orders = load(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    m = k % 20
    pay = F.round(F.col("o_totalprice") * 100) / 100.0
    famt = F.round(F.col("o_totalprice") * 25) / 100.0

    merchant = (
        F.when(m == 0, "LINEPAY*COFFEE SHOP")
        .when(m == 1, "信用卡款繳款-臺銀")
        .when(m == 2, "代收信用卡款繳款服務費")
        .when(m == 3, "刷卡金回饋折抵")
        .when(m == 4, "REFUND SHOP")
        .when(m == 5, "年費")
        .when(m == 6, "VERIFY SHOP")
        .when(m == 7, "TOKYO RAMEN")
        .when(m == 8, "US ONLINE SVC")
        .when(m == 9, "AMAZON US")
        .when(m == 10, "使用e point 1,000點折現金 900元")
        .when(m == 11, "UBER EATS TAIPEI")
        .when(m == 12, "STARBUCKS #123")
        .when(m == 16, "悠遊付加值")
        .otherwise(F.concat(F.lit("MERCHANT-"), (c % 100).cast("string")))
    )
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    return orders.select(
        F.to_date("o_orderdate").alias(S.TRANSACTION_DATE),
        F.lit(None).cast("date").alias(S.POSTING_DATE),
        merchant.alias(S.MERCHANT),
        F.when(m == 7, "JP").when(m.isin(8, 9), "US").otherwise("TW").alias(
            S.MERCHANT_LOCATION
        ),
        null_s.alias(S.CONSUMPTION_PLACE),
        F.lit(None).cast("date").alias(S.CONVERSION_DATE),
        F.when(m == 7, "JPY").when(m == 8, "TWD").when(m == 9, "USD").alias(
            S.CURRENCY_TYPE
        ),
        null_d.alias(S.AMOUNT),
        F.when(m.isin(7, 9), famt).otherwise(null_d).alias(S.CURRENCY_AMOUNT),
        F.when(m == 4, -pay).when(m == 6, F.lit(0.0)).otherwise(pay).alias(
            S.PAYMENT_AMOUNT
        ),
        F.lit("TWD").alias(S.PAYMENT_CURRENCY),
        F.when(m == 0, "1234")
        .when(m == 3, "1111")
        .when(m == 13, "4444/5555")
        .when(m == 14, "5678/9012")
        .when(m == 15, "1111")
        .otherwise("9999")
        .alias(S.CARD_NO),
        null_s.alias(S.CARD_TYPE),
        null_s.alias(S.TRANSACTION_TYPE),
        F.when(m == 15, "Apple Pay").otherwise(null_s).alias(S.MOBILE_PAYMENT),
        F.when(m == 10, "esun_bank")
        .when(m == 13, "cube_bank")
        .otherwise("ctbc_bank")
        .alias(S.BANK_NAME),
        null_s.alias(S.RAW_COUNTRY_CURRENCY),
    )


_SYNTH_CANONICAL_SQL = """
    SELECT
      CAST(o_orderdate AS DATE) AS txn_date,
      CASE (o_orderkey % 20)
        WHEN 0 THEN 'LINEPAY*COFFEE SHOP'
        WHEN 1 THEN '信用卡款繳款-臺銀'
        WHEN 2 THEN '代收信用卡款繳款服務費'
        WHEN 3 THEN '刷卡金回饋折抵'
        WHEN 4 THEN 'REFUND SHOP'
        WHEN 5 THEN '年費'
        WHEN 6 THEN 'VERIFY SHOP'
        WHEN 7 THEN 'TOKYO RAMEN'
        WHEN 8 THEN 'US ONLINE SVC'
        WHEN 9 THEN 'AMAZON US'
        WHEN 10 THEN '使用e point 1,000點折現金 900元'
        WHEN 11 THEN 'UBER EATS TAIPEI'
        WHEN 12 THEN 'STARBUCKS #123'
        WHEN 16 THEN '悠遊付加值'
        ELSE 'MERCHANT-' || CAST(o_custkey % 100 AS VARCHAR)
      END AS merchant,
      CASE (o_orderkey % 20) WHEN 7 THEN 'JP' WHEN 8 THEN 'US' WHEN 9 THEN 'US'
           ELSE 'TW' END AS location,
      CASE (o_orderkey % 20) WHEN 7 THEN 'JPY' WHEN 8 THEN 'TWD'
           WHEN 9 THEN 'USD' ELSE NULL END AS currency_type,
      CASE WHEN (o_orderkey % 20) IN (7, 9)
           THEN round(o_totalprice * 25) / 100.0 ELSE NULL END AS currency_amount,
      CASE (o_orderkey % 20)
        WHEN 4 THEN -(round(o_totalprice * 100) / 100.0)
        WHEN 6 THEN 0.0
        ELSE round(o_totalprice * 100) / 100.0
      END AS payment_amount,
      'TWD' AS payment_currency,
      CASE (o_orderkey % 20)
        WHEN 0 THEN '1234' WHEN 3 THEN '1111' WHEN 13 THEN '4444/5555'
        WHEN 14 THEN '5678/9012' WHEN 15 THEN '1111' ELSE '9999'
      END AS card_no,
      CASE (o_orderkey % 20) WHEN 15 THEN 'Apple Pay' ELSE NULL END AS mobile,
      CASE (o_orderkey % 20) WHEN 10 THEN 'esun_bank' WHEN 13 THEN 'cube_bank'
           ELSE 'ctbc_bank' END AS bank
    FROM orders
"""

_EPOINT_RE = r"使用e point\s*([\d,]+)\s*點折現金\s*([\d,]+)\s*元"

_REFINE_ORACLE = f"""
WITH raw AS ({_SYNTH_CANONICAL_SQL}),
c1 AS (  -- C1 card mapping: snapshot keys, last-match-wins
  SELECT *,
    CASE WHEN card_no = '1234' THEN 'Gogo卡v2'
         WHEN card_no = '5678/9012' THEN 'CUBE卡'
         WHEN card_no = '1111' AND trim(coalesce(mobile, '')) = 'Apple Pay'
             THEN 'U卡ApplePay'
         ELSE NULL END AS card_type1,
    CASE WHEN card_no = '1111' AND trim(coalesce(mobile, '')) = 'Apple Pay'
         THEN 'ApplePay－' ELSE NULL END AS prefix1,
    CASE WHEN card_no = '5678/9012' THEN '5678' ELSE card_no END AS card_no1,
    mobile AS mobile1
  FROM raw
),
h10 AS (  -- Cathay remaining dual card numbers
  SELECT *, CASE WHEN bank = 'cube_bank' AND contains(card_no1, '/')
                 THEN trim(split_part(card_no1, '/', 1))
                 ELSE card_no1 END AS card_no2
  FROM c1
),
c2 AS (  -- third-party payment tagging, blank-mobile guard, FMW
  SELECT *,
    CASE WHEN trim(coalesce(mobile1, '')) = ''
              AND regexp_matches(coalesce(merchant, ''), '^LINEPAY\\*')
             THEN 'LinePay－'
         WHEN trim(coalesce(mobile1, '')) = ''
              AND regexp_matches(coalesce(merchant, ''), '悠遊付')
             THEN '悠遊付－'
         ELSE prefix1 END AS prefix2,
    CASE WHEN trim(coalesce(mobile1, '')) = ''
              AND regexp_matches(coalesce(merchant, ''), '^LINEPAY\\*')
             THEN 'Line Pay'
         WHEN trim(coalesce(mobile1, '')) = ''
              AND regexp_matches(coalesce(merchant, ''), '悠遊付')
             THEN '悠遊付'
         ELSE mobile1 END AS mobile2
  FROM h10
),
h11 AS (  -- e.Point credit extraction (esun only)
  SELECT *,
    (bank = 'esun_bank'
     AND regexp_matches(coalesce(merchant, ''), '(?i)使用e point')
     AND regexp_extract(coalesce(merchant, ''), '{_EPOINT_RE}', 2) <> ''
    ) AS ep_hit,
    CASE WHEN bank = 'esun_bank'
          AND regexp_matches(coalesce(merchant, ''), '(?i)使用e point')
          AND regexp_extract(coalesce(merchant, ''), '{_EPOINT_RE}', 2) <> ''
         THEN -CAST(replace(
                regexp_extract(coalesce(merchant, ''), '{_EPOINT_RE}', 2),
                ',', '') AS DOUBLE)
         ELSE payment_amount END AS payment_amount1
  FROM c2
),
c3 AS (  -- sequential merchant regex canonicalization
  SELECT *, CASE WHEN m3 = '' THEN NULL ELSE m3 END AS merchant3
  FROM (
    SELECT *, CASE WHEN regexp_matches(m2, 'STARBUCKS|星巴克')
                   THEN '星巴克' ELSE m2 END AS m3
    FROM (
      SELECT *, CASE WHEN regexp_matches(m1, '^UberEats$')
                     THEN '優食外送' ELSE m1 END AS m2
      FROM (
        SELECT *, CASE WHEN regexp_matches(coalesce(merchant, ''),
                                           '^UBER\\s*EATS')
                       THEN 'UberEats' ELSE coalesce(merchant, '') END AS m1
        FROM h11
      )
    )
  )
),
i1 AS (  -- classification cascade predicates (strict precedence)
  SELECT *,
    (regexp_matches(coalesce(merchant3, ''), '(?i)信用卡款|繳款')
     AND NOT regexp_matches(coalesce(merchant3, ''), '(?i)代收|手續費|運費')
    ) AS is_payment,
    (NOT (regexp_matches(coalesce(merchant3, ''), '(?i)信用卡款|繳款')
          AND NOT regexp_matches(coalesce(merchant3, ''), '(?i)代收|手續費|運費'))
     AND regexp_matches(coalesce(merchant3, ''), '(?i)刷卡金回饋|折抵')
    ) AS is_credit
  FROM c3
),
i2 AS (
  SELECT *,
    (NOT is_payment AND NOT is_credit AND payment_amount1 < 0) AS is_refund
  FROM i1
),
i3 AS (
  SELECT *,
    (NOT is_payment AND NOT is_credit AND NOT is_refund
     AND regexp_matches(coalesce(merchant3, ''), '(?i)年費|手續費')) AS is_fee
  FROM i2
),
i4 AS (
  SELECT *,
    (NOT is_payment AND NOT is_credit AND NOT is_refund AND NOT is_fee
     AND payment_amount1 = 0) AS is_zero
  FROM i3
),
i5 AS (
  SELECT *,
    (NOT is_payment AND NOT is_credit AND NOT is_refund AND NOT is_fee
     AND NOT is_zero AND payment_amount1 > 0) AS is_general
  FROM i4
),
i6 AS (
  SELECT *,
    (is_general AND coalesce(location, '') <> 'TW') AS is_foreign,
    (coalesce(currency_type, '') <> coalesce(payment_currency, ''))
        AS curr_differ
  FROM i5
),
typed AS (
  SELECT *,
    (is_foreign AND NOT curr_differ AND coalesce(currency_type, '') = 'TWD')
        AS is_twd_cross,
    CASE WHEN is_payment THEN '繳款'
         WHEN is_credit THEN '折抵'
         WHEN is_refund THEN '退刷'
         WHEN is_fee THEN '各項費用'
         WHEN is_zero THEN '驗證/零元'
         WHEN is_foreign AND curr_differ THEN '一般國外交易'
         WHEN is_foreign AND NOT curr_differ
              AND coalesce(currency_type, '') = 'TWD' THEN '台幣跨境交易'
         WHEN is_foreign AND NOT curr_differ
              AND coalesce(currency_type, '') <> 'TWD' THEN '一般雙幣交易'
         WHEN is_general THEN '交易'
         ELSE NULL END AS new_type,
    CASE WHEN is_payment OR is_credit OR is_fee THEN NULL
         ELSE prefix2 END AS final_prefix
  FROM i6
)
SELECT txn_date AS "Transaction_Date",
       CAST(NULL AS DATE) AS "Posting_Date",
       bank AS "Bank_Name",
       CASE WHEN is_payment THEN NULL ELSE card_type1 END AS "Card_Type",
       card_no2 AS "Card_No",
       CASE WHEN final_prefix IS NOT NULL AND trim(final_prefix) <> ''
            THEN final_prefix || coalesce(merchant3, '')
            ELSE merchant3 END AS "Merchant",
       location AS "Merchant_Location",
       CAST(NULL AS VARCHAR) AS "Consumption_Place",
       CAST(NULL AS DATE) AS "Conversion_Date",
       new_type AS "Transaction_Type",
       CASE WHEN is_payment OR is_credit OR is_fee THEN NULL
            ELSE mobile2 END AS "Mobile_Payment",
       currency_type AS "Currency_Type",
       CASE WHEN is_twd_cross THEN payment_amount1
            ELSE currency_amount END AS "Currency_Amount",
       CASE WHEN ep_hit THEN 'TWD' ELSE payment_currency END
           AS "Payment_Currency",
       payment_amount1 AS "Payment_Amount"
FROM typed
"""


@query("refine_pipeline", _REFINE_ORACLE)
def refine_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full transform pipeline (reference refine.py main flow) over the
    scenario fact: conform → C1 → H10 → C2 → H11 → C3 → I1 → H12 →
    15-column refined projection.  Zero shuffles — one codegen'd
    projection chain over the scan."""
    return refine(synth_canonical(spark, sf_dir), REFINE_CONFIG)
