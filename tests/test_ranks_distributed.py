"""The distributed two-pass rank must agree exactly with the
single-window path (and with pandas) — including ties, descending
order, nulls, and partition-boundary values."""

from __future__ import annotations

import pandas as pd
import pytest

from credit_card_etl_pipeline_spark.functions.ranks import with_pct_rank


@pytest.mark.parametrize("ascending", [True, False])
def test_two_pass_matches_single_window_and_pandas(spark, ascending):
    vals = [5.0, 3.0, 3.0, 9.0, 1.0, None, 7.0, 3.0, 9.0, 2.0, 8.0, 6.0]
    pdf = pd.DataFrame({"v": vals})
    df = spark.createDataFrame(pdf)

    small = {
        (r["v"],): r["p"]
        for r in with_pct_rank(
            df, "v", ascending=ascending, out="p", distributed=False
        ).collect()
    }
    # Force many range partitions so cross-partition offsets matter.
    big = {
        (r["v"],): r["p"]
        for r in with_pct_rank(
            df, "v", ascending=ascending, out="p", distributed=True,
            num_partitions=5,
        ).collect()
    }
    assert small == big

    expected = pd.Series(vals).rank(pct=True, ascending=ascending)
    for v, exp in zip(vals, expected):
        if v is None:
            assert big[(None,)] is None or pd.isna(big[(None,)])
        else:
            assert big[(v,)] == pytest.approx(exp, abs=0)
