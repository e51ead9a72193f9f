"""E1: exact pandas ``rank(pct=True)`` parity, including ties and nulls."""

import pandas as pd
import pytest

from credit_card_etl_pipeline_spark.functions.ranks import with_pct_rank


@pytest.mark.parametrize("ascending", [True, False])
@pytest.mark.parametrize(
    "values",
    [
        [3.0, 1.0, 2.0, 2.0, 5.0],           # ties
        [1.0, 1.0, 1.0],                      # all tied
        [10.0],                               # singleton
        [4.0, None, 2.0, None, 4.0, 1.0],     # nulls excluded from n
        [float(x) for x in range(1, 8)],      # no ties
    ],
)
def test_pct_rank_matches_pandas(spark, values, ascending):
    pdf = pd.DataFrame({"id": range(len(values)), "v": values})
    expected = pdf["v"].rank(pct=True, ascending=ascending)

    df = spark.createDataFrame(pdf)
    out = (
        with_pct_rank(df, "v", ascending=ascending, out="p")
        .orderBy("id")
        .collect()
    )
    for row, exp in zip(out, expected):
        if pd.isna(exp):
            assert row["p"] is None
        else:
            assert row["p"] == pytest.approx(exp, abs=1e-12), (
                row,
                exp,
            )
