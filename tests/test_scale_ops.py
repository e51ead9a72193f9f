"""Unit tests for the round-4 scale operators: salted join parity on a
synthetically skewed fact, canonical-selection hand case, and the
rolling-distinct re-expression vs a naive computation."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_join_equals_plain_join(spark):
    from credit_card_etl_pipeline_spark.operators.skew import (
        salted_broadcastless_join,
    )

    # hot key 0 carries half the fact rows
    fact = spark.range(0, 2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.col("id") % 50)
        .alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("attr")
    )
    salted = salted_broadcastless_join(
        fact, dim, "k", n_salts=4, salt_source="row_id"
    )
    plain = fact.join(dim, "k")
    cols = ["k", "row_id", "v", "attr"]
    assert sorted(map(tuple, salted.select(cols).collect())) == sorted(
        map(tuple, plain.select(cols).collect())
    )


def test_canonical_per_component_hand_case(spark):
    from credit_card_etl_pipeline_spark.dataops.dedup import (
        canonical_per_component,
    )

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, component long",
    )
    quality = spark.createDataFrame(
        # component 1: doc 2 longest; component 5: tie -> min id (5)
        [(1, 10), (2, 30), (3, 20), (4, 99), (5, 7), (6, 7)],
        "doc_id long, q long",
    )
    rows = {
        (r.component, r.kept_id, r.kept_quality, r.n_docs)
        for r in canonical_per_component(comps, quality).collect()
    }
    # singleton component 4 is excluded (n_docs > 1 filter)
    assert rows == {(1, 2, 30, 3), (5, 5, 7, 2)}


def test_rolling_7d_users_matches_naive(spark):
    from credit_card_etl_pipeline_spark.queries.streaming_queries import (
        events_rolling_7d_users,
    )

    got = {
        (r.obs_day, r.n_users_7d)
        for r in events_rolling_7d_users(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from credit_card_etl_pipeline_spark.functions.eventtime import (
        event_micros,
    )

    ud = [
        (r.user_id, r.day)
        for r in ev.select(
            "user_id", (event_micros(ev) / 86_400_000_000).cast("long").alias("day")
        )
        .distinct()
        .collect()
    ]
    days = {d for _, d in ud}
    want = set()
    for obs in range(min(days), max(days) + 1):
        users = {u for u, d in ud if obs - 6 <= d <= obs}
        want.add((obs, len(users)))
    assert got == want


def test_prorate_cents_sum_back_exactly(spark, sf_dir):
    """Largest-remainder allocation: per order, allocated cents must
    sum to the order total exactly — the invariant naive rounding
    breaks."""
    from pyspark.sql import functions as F

    import credit_card_etl_pipeline_spark.queries as q

    out = q.QUERIES["lineitem_prorate_cents"](spark, sf_dir)
    per_order = out.groupBy("k").agg(F.sum("alloc_cents").alias("got"))
    totals = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("want"),
        )
    )
    # only orders that have line items participate
    joined = per_order.join(totals, "k")
    bad = joined.where(F.col("got") != F.col("want")).count()
    assert bad == 0
