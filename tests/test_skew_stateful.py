"""Tests for the skew-spread aggregation and the custom stateful
streaming operator."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from credit_card_etl_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_count,
    salted_count_distinct,
    salted_max,
    salted_sum,
)

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amt"),
    )
    plain = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amt").alias("s"),
            F.max("amt").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["sum_amt"], r["max_amt"])
        for r in salted_aggregate(
            df,
            ["k"],
            [salted_count(), salted_sum("amt"), salted_max("amt")],
            n_salts=8,
            salt_source="id",
        ).collect()
    }
    assert plain == salted


def test_salted_count_distinct_matches_plain(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    plain = {
        r["o_orderpriority"]: r["n"]
        for r in df.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    salted = {
        r["o_orderpriority"]: r["n_distinct"]
        for r in salted_count_distinct(
            df, ["o_orderpriority"], "o_custkey"
        ).collect()
    }
    assert plain == salted


@pytest.mark.timeout(300)
def test_stateful_stream_final_state_matches_batch(spark, tmp_path):
    from credit_card_etl_pipeline_spark.streaming.stateful import (
        running_user_stats,
        running_user_stats_batch,
    )
    from credit_card_etl_pipeline_spark.streaming.windows import (
        event_time,
        events_stream,
    )

    stream = event_time(events_stream(spark, SF))
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    # last update per user = final cumulative state
    final = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in spark.sql(
            """SELECT user_id, n_events, value_cents FROM (
                 SELECT *, row_number() OVER (
                     PARTITION BY user_id ORDER BY n_events DESC) AS rn
                 FROM user_stats) WHERE rn = 1"""
        ).collect()
    }
    batch = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in running_user_stats_batch(
            spark.read.parquet(f"{SF}/events.parquet")
        ).collect()
    }
    assert final == batch
    assert len(final) > 0
