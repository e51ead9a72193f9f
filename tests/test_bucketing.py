"""Bucketed co-located join: the join of two tables bucketed on the
join key must plan with NO Exchange (shuffle) on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credit_card_etl_pipeline_spark.operators.bucketing import (
    enable_bucketed_joins,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.timeout(300)
def test_bucketed_join_has_no_exchange(spark, tmp_path):
    enable_bucketed_joins(spark)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "orders_b",
        keys=["custkey"],
        buckets=4,
        path=str(tmp_path / "orders_b"),
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "customer_b",
        keys=["custkey"],
        buckets=4,
        path=str(tmp_path / "customer_b"),
    )
    # force the sort-merge path so co-location (not broadcast) is tested
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(spark.table("customer_b"), "custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        # sanity: result is correct
        n = joined.count()
        assert n == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
