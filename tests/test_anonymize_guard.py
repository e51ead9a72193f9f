"""mask_cards driver-side cardinality guard (C7, generate_mock.py:145).

The pseudonymizer collects the distinct card set to the driver — fine
for a real card dimension, fatal if someone keys it on a fact-sized
column.  The guard must fail fast with an actionable message instead of
melting driver memory."""

from __future__ import annotations

import pytest

from credit_card_etl_pipeline_spark import anonymize
from credit_card_etl_pipeline_spark.anonymize import mask_cards


def test_mask_cards_small_dimension_ok(spark):
    df = spark.createDataFrame(
        [("1111222233334444", 10), ("5555666677778888", 20), (None, 30)],
        "Card_No string, amt int",
    )
    out, fake_map = mask_cards(df)
    got = {r["amt"]: r["Card_No"] for r in out.collect()}
    assert len(fake_map) == 2
    assert got[10].startswith("****-****-****-")
    assert got[30] is None  # null cards pass through unmasked


def test_mask_cards_fact_sized_column_fails_fast(spark, monkeypatch):
    monkeypatch.setattr(anonymize, "MAX_DISTINCT_CARDS", 10)
    df = spark.range(50).selectExpr("CAST(id AS STRING) AS Card_No")
    with pytest.raises(ValueError, match="mis-keyed"):
        mask_cards(df)


def test_inject_noise_rejects_non_integral_amounts(spark):
    """inject_noise's exact-int64 formula presumes inputs integral at
    ``decimals``; a sub-cent feed must diverge loudly, not silently
    re-quantize (ADVICE r8)."""
    from credit_card_etl_pipeline_spark.anonymize import inject_noise

    ok = spark.createDataFrame([(1, 12.34), (2, 0.05)], "id long, amt double")
    assert inject_noise(ok, ["amt"], id_col="id").count() == 2

    bad = spark.createDataFrame([(1, 12.345)], "id long, amt double")
    with pytest.raises(Exception, match="not integral"):
        inject_noise(bad, ["amt"], id_col="id").collect()
