"""Unit tests for the general-cleanse expressions (H1-H4 edge cases the
fixture files can't reach: invalid dates, malformed parts, unknown
country shapes)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from credit_card_etl_pipeline_spark.functions.cleanse import (
    clean_amount,
    fix_card_no,
    normalize_country_code,
    parse_date_with_year,
)


def _eval(spark, pdf: pd.DataFrame, expr, extra_cols=()):
    df = spark.createDataFrame(pdf)
    return [r["out"] for r in df.select(expr.alias("out"), *extra_cols).collect()]


def test_normalize_country_code(spark):
    vals = [None, "", "  ", "JPN CHIYODA-KU", "usa", "tw", "GB", "XYZ", "TWN"]
    out = _eval(
        spark, pd.DataFrame({"c": vals}), normalize_country_code("c")
    )
    assert out == ["TW", "TW", "TW", "JP", "US", "TW", "GB", "XYZ", "TW"]


def test_parse_date_with_year_edges(spark):
    pdf = pd.DataFrame(
        {
            "d": ["01/15", "12/30", "01/05", "2024/2/3", "(null)", "nan",
                  "", "13/45", "junk", "1/2/3/4"],
            "by": [2024] * 10,
            "bm": [1, 1, 12, 1, 1, 1, 1, 1, 1, 1],
        }
    )
    out = _eval(
        spark,
        pdf,
        parse_date_with_year(F.col("d"), F.col("by"), F.col("bm")),
    )
    assert out == [
        dt.date(2024, 1, 15),
        dt.date(2023, 12, 30),   # cross-year back
        dt.date(2025, 1, 5),     # cross-year forward
        dt.date(2024, 2, 3),     # 3-part direct
        None, None, None,        # sentinels
        None,                    # invalid month/day → coerce null
        None,                    # unparseable
        None,                    # 4 parts
    ]


def test_fix_card_no_and_amounts(spark):
    pdf = pd.DataFrame({"c": ["1234.0", "nan", "", "5678", "12.50"]})
    assert _eval(spark, pdf, fix_card_no("c")) == [
        "1234", None, None, "5678", "12.50",
    ]
    # note: '12.50' has no trailing '.0' literal → untouched (regex `\.0$`
    # only strips the float artifact, matching the reference replace)
    pdf2 = pd.DataFrame({"c": [" 1,234.56 ", "200", "N/A", "", "-5,000"]})
    assert _eval(spark, pdf2, clean_amount("c")) == [
        1234.56, 200.0, None, None, -5000.0,
    ]
