#!/usr/bin/env python
"""Regenerate the committed OLE2 binary .xls statement fixture.

The reference's Excel path (etl.py:312-316) accepts legacy binary .xls
workbooks via pandas/xlrd; this engine parses them with the vendored
stdlib BIFF8 reader (sources/xls.py).  The fixture content below is the
ground truth hand-transcribed into the `ingest_xls_statement` oracle in
queries/etl_queries.py — keep the two in sync.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from credit_card_etl_pipeline_spark.sources.xls import write_minimal_xls

ROWS: list[list[object]] = [
    ["消費日", "卡號末四碼", "消費明細", "新臺幣金額"],
    ["06/01", "4321", "超商 寄杯", "55"],
    ["06/03", "4321", "高鐵 台北-左營", 1490],  # NUMBER record
    ["06/07", "", "台新Richart轉帳回饋", "-120"],
    ["06/15", "8765", "書店  文具", "2,480"],
]


def main() -> None:
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "台新_202406.xls",
    )
    write_minimal_xls(out, ROWS, sheet="信用卡帳單")
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
