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


def test_snapshot_diff_cdc_roundtrip(spark, sf_dir):
    """Applying the generated change feed to v0 must reproduce v1
    exactly — the diff/apply round-trip both docstrings promise."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import credit_card_etl_pipeline_spark.queries as q

    feed = q.QUERIES["warehouse_snapshot_diff"](spark, sf_dir)

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v0 = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amt_cents"),
    )
    # v1 per the same deterministic rules the query synthesizes
    v1 = (
        v0.where(F.col("k") % 11 != 4)
        .select(
            "k",
            F.when(F.col("k") % 5 == 2, F.col("amt_cents") + 1000)
            .otherwise(F.col("amt_cents"))
            .alias("amt_cents"),
        )
        .unionByName(
            v0.where(F.col("k") % 13 == 6).select(
                (-F.col("k") - 1).alias("k"), "amt_cents"
            )
        )
    )

    # apply the feed to v0: upserts replace/insert, deletes drop
    log = v0.select(
        "k", F.lit(0).alias("seq"), F.lit("K").alias("op"), "amt_cents"
    ).unionByName(
        feed.select(
            "k",
            F.lit(1).alias("seq"),
            "op",
            F.col("after_cents").alias("amt_cents"),
        )
    )
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    applied = (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("k", "amt_cents")
    )
    assert applied.exceptAll(v1).count() == 0
    assert v1.exceptAll(applied).count() == 0


def test_prefix_filter_exact_on_random_vocab(spark):
    """Prefix-filter exactness on an adversarial random vocabulary:
    candidates from rarest-first prefixes must find every pair that
    full blocking scores >= the threshold."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(42)
    words = ["spark", "query", "table", "shard", "merge", "scan",
             "joint", "batch", "index", "group"]
    names = list({
        " ".join(rng.sample(words, 3)) for _ in range(300)
    })
    master = spark.createDataFrame([(n,) for n in names], "name string")
    dirty_rows = []
    for i, n in enumerate(names):
        if i % 2 == 0:
            cut = i % len(n)
            dirty_rows.append((i, n[:cut] + n[cut + 1:]))
    dirty = spark.createDataFrame(dirty_rows, "k long, dirty_name string")

    def grams(df, col, *keep):
        return (
            df.select(
                *keep,
                F.explode(
                    F.expr(
                        f"transform(sequence(1, greatest(length({col}) - 2,"
                        f" 1)), i -> substr({col}, i, 3))"
                    )
                ).alias("g"),
            )
            .distinct()
        )

    mg = grams(master, "name", "name")
    dg = grams(dirty, "dirty_name", "k")
    msize = mg.groupBy("name").agg(F.count(F.lit(1)).alias("nb"))
    dsize = dg.groupBy("k").agg(F.count(F.lit(1)).alias("na"))

    # full-blocking truth: every pair sharing ANY gram, scored
    full = (
        dg.join(mg, "g")
        .groupBy("k", "name")
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(dsize, "k")
        .join(msize, "name")
        .where(F.expr("1000 * inter div (na + nb - inter)") >= 400)
        .select("k", "name")
    )

    # prefix-filtered candidates
    from pyspark.sql import Window

    dfg = mg.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    wm = Window.partitionBy("name").orderBy(F.coalesce("df", F.lit(0)), "g")
    mpref = (
        mg.join(dfg, "g", "left")
        .withColumn("rn", F.row_number().over(wm))
        .join(msize, "name")
        .where(F.col("rn") <= F.expr("nb - (2 * nb + 4) div 5 + 1"))
        .select("name", "g")
    )
    wd = Window.partitionBy("k").orderBy(F.coalesce("df", F.lit(0)), "g")
    dpref = (
        dg.join(dfg, "g", "left")
        .withColumn("rn", F.row_number().over(wd))
        .join(dsize, "k")
        .where(F.col("rn") <= F.expr("na - (2 * na + 4) div 5 + 1"))
        .select("k", "g")
    )
    cand = dpref.join(mpref, "g").select("k", "name").distinct()

    missed = full.exceptAll(full.join(cand, ["k", "name"], "left_semi"))
    assert missed.count() == 0
