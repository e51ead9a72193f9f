"""Behavioral event analytics (engine extension): cohort retention,
funnel conversion, and event-type transition matrices over the
``events`` stream — the product-analytics query family a warehouse on
this engine serves alongside the ETL/RFM surface.

Cross-engine determinism: event time is exact integer epoch arithmetic
on both sides (Spark derives micros type-adaptively via
``functions.eventtime.event_micros`` — nanos-long div 1000 or
TIMESTAMP_NTZ timestampdiff — matching DuckDB's ``epoch_us(ts)``
exactly and timezone-independently), orderings tie-break on the unique
``event_id``, and every output column is BIGINT/VARCHAR — no floats
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.eventtime import event_micros
from . import load, query

#: Week index since the epoch: micros // 1 day // 7 (all positive here,
#: so truncating and flooring division agree on both engines); applied
#: to a column already named ``us``.
_WEEK = "us div 86400000000 div 7"


# ------------------------------------------------------------------
# Cohort retention (weekly)
# ------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH weeks AS (
    SELECT user_id,
           CAST((epoch_us(ts) // 86400000000) // 7 AS BIGINT) AS week
    FROM events
),
firsts AS (
    SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, week FROM weeks)
SELECT f.cohort_week,
       a.week - f.cohort_week AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM active a JOIN firsts f USING (user_id)
GROUP BY f.cohort_week, week_offset
"""


@query("events_cohort_retention", _RETENTION_ORACLE)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are cohorted by their first-ever
    active week and counted at each later week they return — the
    classic retention triangle.  Two aggregations shuffle on user_id
    (first-week min, distinct active weeks); the join back is
    key-aligned on user_id so AQE plans it without a third full
    shuffle, and the final (cohort, offset) aggregate is
    calendar-bounded, not fact-bounded."""
    e = load(spark, sf_dir, "events")
    weeks = e.select(
        "user_id", event_micros(e).alias("us")
    ).select("user_id", F.expr(_WEEK).cast("long").alias("week"))
    firsts = weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    active = weeks.distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


# ------------------------------------------------------------------
# Funnel conversion (ordered signup → click → purchase)
# ------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s AS (
    SELECT user_id, min(epoch_us(ts)) AS s_us
    FROM events WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS c_us
    FROM events e JOIN s ON e.user_id = s.user_id
    WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.s_us
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_us
    GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_funnel
"""


@query("events_funnel_conversion", _FUNNEL_ORACLE)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up, then clicked strictly after
    their first signup, then purchased strictly after that first
    qualifying click.

    ONE-PASS shape: the fact is scanned once (filtered to the three
    funnel types, predicate pushed to the scan) and shuffled on
    user_id exactly once; the three stage frontiers are stacked
    whole-partition window aggregates over the SAME partitioning —
    each stage's conditional min reads the previous stage's column —
    so Catalyst plans a single Exchange for all three, followed by a
    same-key per-user rollup (no further shuffle) and one scalar
    aggregate.  The previous version joined three per-stage aggregates
    and shuffled the fact three times."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", event_micros(ev).alias("us")
    ).where(F.col("event_type").isin("signup", "click", "purchase"))
    w = Window.partitionBy("user_id")
    typ = F.col("event_type")
    staged = (
        e.withColumn(
            "s_us", F.min(F.when(typ == "signup", F.col("us"))).over(w)
        )
        .withColumn(
            "c_us",
            F.min(
                F.when(
                    (typ == "click") & (F.col("us") > F.col("s_us")),
                    F.col("us"),
                )
            ).over(w),
        )
        .withColumn(
            "p_hit",
            F.max(
                F.when(
                    (typ == "purchase") & (F.col("us") > F.col("c_us")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("s_us").alias("s_us"),
        F.min("c_us").alias("c_us"),
        F.max("p_hit").alias("p_hit"),
    )
    return per_user.agg(
        F.count(F.col("s_us")).cast("long").alias("n_signup"),
        F.count(F.col("c_us")).cast("long").alias("n_click_after"),
        F.sum("p_hit").cast("long").alias("n_purchase_funnel"),
    )


# ------------------------------------------------------------------
# Event-type transition matrix (first-order Markov counts)
# ------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH ordered AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS prev_type
    FROM events
)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM ordered WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


@query("events_type_transitions", _TRANSITIONS_ORACLE)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix: consecutive event-type pairs per
    user, counted corpus-wide (the session-flow / Markov-chain input).
    One shuffle on user_id; the lag window orders each user's history
    by (micros, event_id) — the unique id makes same-microsecond
    ordering deterministic on both engines — and the |types|² aggregate
    that follows is tiny."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", event_micros(ev).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


# ------------------------------------------------------------------
# First-touch attribution
# ------------------------------------------------------------------

_ATTRIBUTION_ORACLE = """
WITH e AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
fp AS (
    SELECT user_id, min(us) AS p_us
    FROM e WHERE event_type = 'purchase' GROUP BY user_id
),
pre AS (
    SELECT e.user_id, e.event_type, e.us, e.event_id
    FROM e JOIN fp USING (user_id)
    WHERE e.us < fp.p_us
),
ranked AS (
    SELECT user_id, event_type,
           row_number() OVER (
               PARTITION BY user_id ORDER BY us, event_id
           ) AS rn
    FROM pre
)
SELECT event_type AS first_touch, CAST(count(*) AS BIGINT) AS n_users
FROM ranked WHERE rn = 1
GROUP BY event_type
"""


@query("events_attribution_first_touch", _ATTRIBUTION_ORACLE)
def events_attribution_first_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch attribution: for every converting user, the type of
    their earliest event strictly before their first purchase, counted
    per channel.

    ONE-PASS shape: a whole-partition window computes the per-user
    purchase frontier, and a second window over the SAME user_id
    partitioning takes the MIN of a (us, event_id, event_type) struct
    over the pre-frontier rows — struct ordering gives the earliest
    event with the (us, event_id) tiebreak both engines share, with NO
    sort at all (both windows are unordered whole-partition
    aggregates sharing one Exchange).  A same-key per-user rollup and
    a tiny per-channel aggregate finish it.  The previous version
    pre-aggregated the purchase slice and joined it back, scanning and
    shuffling the fact twice."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", event_micros(ev).alias("us")
    )
    w = Window.partitionBy("user_id")
    staged = e.withColumn(
        "p_us",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).over(w),
    ).withColumn(
        "ft",
        F.min(
            F.when(
                F.col("us") < F.col("p_us"),
                F.struct("us", "event_id", "event_type"),
            )
        ).over(w),
    )
    per_user = (
        staged.groupBy("user_id")
        .agg(F.min("ft").alias("ft"))
        .where(F.col("ft").isNotNull())
    )
    return per_user.groupBy(
        F.col("ft.event_type").alias("first_touch")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))


# ------------------------------------------------------------------
# Day-of-week × hour activity heatmap (integer calendar math)
# ------------------------------------------------------------------

_HEATMAP_ORACLE = """
WITH e AS (
    SELECT epoch_us(ts) AS us FROM events
)
SELECT CAST(((us // 86400000000) + 4) % 7 AS BIGINT) AS dow,
       CAST((us // 3600000000) % 24 AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events
FROM e
GROUP BY 1, 2
"""


@query("events_hourly_heatmap", _HEATMAP_ORACLE)
def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap.  Calendar fields
    derive from PURE integer epoch arithmetic (1970-01-01 was a
    Thursday, so dow = (days + 4) % 7 with 0 = Sunday) rather than the
    engines' dayofweek() builtins, whose numbering conventions differ
    (Spark counts 1-7 from Sunday, DuckDB 0-6) — the classic silent
    cross-engine off-by-one this query pins shut."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(event_micros(ev).alias("us"))
    return (
        e.select(
            F.expr("(us div 86400000000 + 4) % 7").cast("long").alias("dow"),
            F.expr("(us div 3600000000) % 24").cast("long").alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


# ------------------------------------------------------------------
# Time-decayed engagement score (half-life weighting, exact integers)
# ------------------------------------------------------------------

_DECAY_ORACLE = """
WITH e AS (
    SELECT user_id, epoch_us(ts) AS us FROM events
),
anchor AS (SELECT max(us) AS max_us FROM e),
aged AS (
    SELECT user_id,
           least((max_us - us) // 604800000000, 50) AS weeks_old
    FROM e CROSS JOIN anchor
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(1::BIGINT << (50 - weeks_old)) AS BIGINT)
           AS decayed_score_x2e50
FROM aged
GROUP BY user_id
"""


@query("events_decayed_user_score", _DECAY_ORACLE)
def events_decayed_user_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed engagement score (the recency weighting a
    feature store applies to interaction counts): each event
    contributes 2^-weeks_old, summed per user.  The half-life is a
    power of two ON PURPOSE — every contribution is an exact BIGINT
    (2^(50-age), age capped at 50 weeks ≈ a 1e-15 weight), so the
    score needs no float pow() whose libm rounding differs across
    engines.  The corpus-max anchor is a 1-row broadcast; one shuffle
    on user_id."""
    ev = load(spark, sf_dir, "events")
    e = ev.select("user_id", event_micros(ev).alias("us"))
    anchor = e.agg(F.max("us").alias("max_us"))
    aged = e.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.least(
            F.expr("(max_us - us) div 604800000000"), F.lit(50)
        ).alias("weeks_old"),
    )
    return aged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.expr("shiftleft(1L, CAST(50 - weeks_old AS INT))"))
        .cast("long")
        .alias("decayed_score_x2e50"),
    )
