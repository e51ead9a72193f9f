"""C3 sequential cascade with a large rule corpus: the plan must stay
linear in the rule count (the naive nested fold is exponential and
would hang analysis well before 60 rules), and chained re-matching
semantics must hold across many steps."""

from __future__ import annotations

import time

import pandas as pd

from credit_card_etl_pipeline_spark.operators.merchants import (
    clean_merchant_by_regex,
)


def test_sixty_rule_cascade_analyzes_fast_and_rematches(spark):
    # chain: STEP0 → STEP1 → … → STEP59 (each rule rewrites the
    # previous rule's output — worst-case sequential semantics)
    rules = [
        {"Pattern": f"^STEP{i}$", "Replacement": f"STEP{i + 1}", "Priority": "1"}
        for i in range(60)
    ]
    pdf = pd.DataFrame({"Merchant": ["STEP0", "STEP30", "OTHER", None]})
    df = spark.createDataFrame(pdf)

    t0 = time.perf_counter()
    out = clean_merchant_by_regex(df, rules)
    rows = {r["Merchant"] for r in out.collect()}
    elapsed = time.perf_counter() - t0

    # full 60-step chain walked from STEP0; partial from STEP30
    assert rows == {"STEP60", "OTHER", None}
    # linear plan: analysis+execution in seconds, not exponential
    assert elapsed < 60
