"""End-to-end ingest tests over dirty fixture files (FIXTURES.md §1):
junk preambles, ROC/western filename periods, cross-year dates, master
rows + ordered forward-fill + payment clearing, fused foreign fields,
Big5/cp950 encodings, and an HTML statement."""

from __future__ import annotations

import datetime as dt

import pytest

from credit_card_etl_pipeline_spark import schema as S
from credit_card_etl_pipeline_spark.plans.etl import run_etl

ESUN_CSV = """帳單資訊,,,,,
歡迎使用網路帳單,,,,,
交易日期,入帳日期,卡號末四碼,交易說明,外幣金額,臺幣金額
01/15,01/16,,卡號：XXXX-XXXX-XXXX-1234（Unicard－正卡）,,
01/10,01/11,,全聯福利中心,,"1,234"
12/30,12/31,,星巴克咖啡,,200
01/12,01/13,,AMAZON.CO.JP  JPN CHIYODA-KU 01/15,"1,500.50",450
01/20,01/21,,信用卡繳款感謝您 轉帳,,-5000
"""

CUBE_CSV = """國泰世華帳單,,,,,,
交易日,入帳日,卡號末四碼,交易說明,臺幣金額,消費地/幣別,信用卡號
02/01,02/02,5678/9012,ＬＩＮＥ　ＰＡＹ全家便利商店,150,TW / TWD,****
02/05,02/06,5678/9012,AMAZON JAPAN,3000,JPN TOKYO / JPY,****
2024/02/10,02/11,1111,誠品書店,500,,****
"""

CTBC_CSV = """歡迎使用中國信託帳單,,,,,,
消費日期,入帳日期,卡號末四碼,商店名稱,臺幣金額,外幣金額,幣別
03/05,03/06,2222,麥當勞,180,,
03/08,03/09,2222,UBER EATS,250,,
"""

HNCB_HTML = """<html><body>
<table><tr><td>其他無關表格</td></tr></table>
<table>
<tr><th>交易日期</th><th>入帳日期</th><th>卡號末四碼</th><th>摘要</th><th>金額</th></tr>
<tr><td>04/01</td><td>04/02</td><td></td><td>旅鉅卡************3333</td><td></td></tr>
<tr><td>04/03</td><td>04/04</td><td></td><td>家樂福</td><td>890</td></tr>
</table>
</body></html>"""


@pytest.fixture(scope="module")
def etl_result(spark, tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("statements")
    (data_dir / "玉山銀行113年1月.csv").write_text(ESUN_CSV, encoding="utf-8")
    (data_dir / "國泰世華_202402.csv").write_text(CUBE_CSV, encoding="utf-8")
    (data_dir / "中信_202403.csv").write_bytes(CTBC_CSV.encode("cp950"))
    (data_dir / "華南_202404.html").write_bytes(HNCB_HTML.encode("big5"))
    df = run_etl(spark, str(data_dir))
    rows = df.collect()
    return {(r[S.BANK_NAME], r[S.MERCHANT]): r for r in rows}, rows


def test_row_count_and_master_drop(etl_result):
    by_key, rows = etl_result
    # 5 esun data rows minus 1 master, 3 cube, 2 ctbc, 2 hncb minus 1 master
    assert len(rows) == 10
    assert not any("卡號：" in (r[S.MERCHANT] or "") for r in rows)
    assert not any("*" * 12 in (r[S.MERCHANT] or "") for r in rows)


def test_esun_ffill_and_payment_clear(etl_result):
    by_key, _ = etl_result
    detail = by_key[("esun_bank", "全聯福利中心")]
    assert detail[S.CARD_NO] == "1234"
    assert detail[S.CARD_TYPE] == "Unicard"
    assert detail[S.AMOUNT] == 1234.0
    assert detail[S.PAYMENT_AMOUNT] == 1234.0  # H5 fill
    # payment row must NOT inherit the card (etl.py:190-195)
    payment = by_key[("esun_bank", "信用卡繳款感謝您 轉帳")]
    assert payment[S.CARD_NO] is None
    assert payment[S.CARD_TYPE] is None


def test_esun_cross_year_date(etl_result):
    by_key, _ = etl_result
    row = by_key[("esun_bank", "星巴克咖啡")]
    # ROC filename 113年1月 → base 2024 / bill month 1; 12/30 → 2023
    assert row[S.TRANSACTION_DATE] == dt.date(2023, 12, 30)


def test_esun_foreign_split(etl_result):
    by_key, _ = etl_result
    row = by_key[("esun_bank", "AMAZON.CO.JP")]
    assert row[S.CONSUMPTION_PLACE] == "JPN CHIYODA-KU"
    assert row[S.MERCHANT_LOCATION] == "JP"  # H1 normalize of JPN …
    assert row[S.CONVERSION_DATE] == dt.date(2024, 1, 15)
    assert row[S.CURRENCY_AMOUNT] == 1500.5
    assert row[S.CURRENCY_TYPE] == "TWD"  # H6 foreign default


def test_cube_country_currency_split(etl_result):
    by_key, _ = etl_result
    domestic = by_key[("cube_bank", "ＬＩＮＥ　ＰＡＹ全家便利商店")]
    # TW / TWD → domestic scrub clears currency fields (H6)
    assert domestic[S.MERCHANT_LOCATION] == "TW"
    assert domestic[S.CURRENCY_TYPE] is None
    foreign = by_key[("cube_bank", "AMAZON JAPAN")]
    assert foreign[S.MERCHANT_LOCATION] == "JP"
    assert foreign[S.CURRENCY_TYPE] == "JPY"
    assert foreign[S.CARD_NO] == "5678/9012"  # dual number survives ETL


def test_cube_three_part_date(etl_result):
    by_key, _ = etl_result
    row = by_key[("cube_bank", "誠品書店")]
    assert row[S.TRANSACTION_DATE] == dt.date(2024, 2, 10)
    assert row[S.MERCHANT_LOCATION] == "TW"  # blank → TW (H1)


def test_ctbc_big5_and_defaults(etl_result):
    by_key, _ = etl_result
    row = by_key[("ctbc_bank", "麥當勞")]
    assert row[S.TRANSACTION_DATE] == dt.date(2024, 3, 5)
    assert row[S.MERCHANT_LOCATION] == "TW"
    assert row[S.CURRENCY_TYPE] is None  # default TWD then domestic scrub
    assert row[S.PAYMENT_AMOUNT] == 180.0


def test_hncb_html_and_ffill(etl_result):
    by_key, _ = etl_result
    row = by_key[("hncb_bank", "家樂福")]
    assert row[S.CARD_NO] == "3333"
    assert row[S.CARD_TYPE] == "旅鉅卡"
    assert row[S.AMOUNT] == 890.0
