"""Windowed event aggregations (streaming surface, batch-checked).

The window functions in ``streaming.windows`` are batch/stream
symmetric; here the batch shape runs against DuckDB oracles that
recompute every window in pure integer epoch arithmetic (epoch micros
→ bucket; Spark derives the same micros type-adaptively via
functions.eventtime), so the window assignment logic itself is
value-checked.  Stream == batch is asserted separately in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windows import (
    event_time,
    events_stream,
    session_counts,
    sized_state_partitions,
    sliding_counts,
    tumbling_counts,
)
from . import load, query

#: epoch micros of the event timestamp, exact integer arithmetic.
_US_SQL = "epoch_us(ts)"

_TUMBLING_ORACLE = f"""
WITH e AS (
    SELECT {_US_SQL} AS us, event_type,
           CAST(round(value * 100) AS BIGINT) AS vc
    FROM events
)
SELECT (us // 300000000) * 300 AS window_start,
       event_type,
       count(*) AS n_events,
       sum(vc) / 100.0 AS value_sum
FROM e
GROUP BY 1, 2
"""


@query("events_tumbling_window", _TUMBLING_ORACLE)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windows per event_type (count + exact value
    sum via integer cents)."""
    events = event_time(load(spark, sf_dir, "events"))
    return tumbling_counts(events, "5 minutes")


_SLIDING_ORACLE = f"""
WITH e AS (
    SELECT {_US_SQL} AS us, event_type,
           CAST(round(value * 100) AS BIGINT) AS vc
    FROM events
),
w AS (
    SELECT unnest([
             ((us // 300000000) * 300),
             ((us // 300000000) * 300 - 300)
           ]) AS window_start,
           event_type, vc
    FROM e
)
SELECT window_start, event_type,
       count(*) AS n_events,
       sum(vc) / 100.0 AS value_sum
FROM w
GROUP BY 1, 2
"""


@query("events_sliding_window", _SLIDING_ORACLE)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5 — every event lands in exactly
    two windows; the oracle enumerates both starts per event."""
    events = event_time(load(spark, sf_dir, "events"))
    return sliding_counts(events, "10 minutes", "5 minutes")


_SESSION_ORACLE = f"""
WITH e AS (
    SELECT user_id, {_US_SQL} AS us FROM events
),
flagged AS (
    SELECT user_id, us,
           CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                     >= 600000000
                OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM e
),
sessions AS (
    SELECT user_id, us,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT min(us) // 1000000 AS session_start,
       (max(us) + 600000000) // 1000000 AS session_end,
       user_id,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, sid
"""


@query("events_session_windows", _SESSION_ORACLE)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (10-minute inactivity gap) via Spark's
    native session_window; oracle recomputes sessions with
    gaps-and-islands SQL (lag + running sum)."""
    events = event_time(load(spark, sf_dir, "events"))
    return session_counts(events, "10 minutes")


# ====================================================================
# Custom stateful operator (applyInPandasWithState) — end-state oracle
# ====================================================================

_STATEFUL_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY user_id
"""

#: memory-sink names must be unique per start within a session.
_stateful_run_counter = iter(range(1_000_000))


@query("stream_stateful_user_stats", _STATEFUL_ORACLE)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL custom stateful streaming operator
    (``streaming.stateful.running_user_stats``: per-user cumulative
    count/value state via ``applyInPandasWithState``) as a streaming
    query — availableNow trigger, memory sink, update mode — then
    extracts each user's final state (the update with the highest
    cumulative count).  The end state of the stateful stream must equal
    a plain batch aggregation, which is the SQL-expressible oracle; the
    per-batch burst/batch_events surface stays pytest-pinned
    (tests/test_skew_stateful.py)."""
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..streaming.stateful import running_user_stats

    name = f"user_stats_oracle_{next(_stateful_run_counter)}"
    stream = event_time(events_stream(spark, sf_dir))
    with sized_state_partitions(spark, sf_dir, "events"):
        q = (
            running_user_stats(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="stateful_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "value_cents")
    )


# ====================================================================
# Streaming ingest dedup (stateful dropDuplicates)
# ====================================================================

_STREAM_DEDUP_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY user_id
"""


@query("stream_dedup_ingest", _STREAM_DEDUP_ORACLE)
def stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion dedup: the events stream UNIONED WITH ITSELF
    (an at-least-once source redelivering every record) flows through
    stateful ``dropDuplicates`` on event_id; the deduped append stream
    lands in a memory sink and is batch-aggregated per user.  Equality
    with the plain single-copy batch aggregation proves the duplicate
    deliveries were all suppressed — without the dedup every count and
    sum would be exactly doubled."""
    import tempfile

    from pyspark.sql import functions as F

    from ..streaming.stateful import dedup_stream

    name = f"dedup_ingest_oracle_{next(_stateful_run_counter)}"
    doubled = events_stream(spark, sf_dir).unionByName(
        events_stream(spark, sf_dir)
    )
    with sized_state_partitions(spark, sf_dir, "events"):
        q = (
            dedup_stream(doubled)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="dedup_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("vc").cast("long").alias("value_cents"),
        )
    )


# ====================================================================
# Streaming curation composition (ingest dedup → scrub → filter)
# ====================================================================

def _stream_curate_oracle() -> str:
    """Batch twin of the streaming curation pipeline: PII-injected
    docs → scrub → quality rules → per-lang totals (single-copy,
    i.e. after perfect dedup)."""
    from .curate_queries import _NORM_SQL, _PII_SCRUB_SQL, _PII_TEXT_SQL

    return f"""
WITH pii AS (
    SELECT doc_id, lang, {_PII_TEXT_SQL} AS t FROM documents
),
scrub AS (
    SELECT doc_id, lang, {_PII_SCRUB_SQL} AS text FROM pii
),
sig AS (
    SELECT lang,
           CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(string_split({_NORM_SQL}, ' '))
                - len(list_distinct(string_split({_NORM_SQL}, ' ')))
                AS BIGINT) AS n_dup_tokens,
           CAST(length({_NORM_SQL})
                - (len(string_split({_NORM_SQL}, ' ')) - 1)
                AS BIGINT) AS n_word_chars
    FROM scrub
),
kept AS (
    SELECT * FROM sig
    WHERE NOT (n_tokens < 10
               OR n_dup_tokens / CAST(n_tokens AS DOUBLE) > 0.6
               OR n_word_chars / CAST(n_tokens AS DOUBLE) < 3.0
               OR n_word_chars / CAST(n_tokens AS DOUBLE) > 10.0)
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM kept
GROUP BY lang
"""


@query("stream_curation_pipeline", _stream_curate_oracle())
def stream_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation as a STREAMING ingest composition: the documents stream
    unioned with itself (at-least-once redelivery) flows through
    stateful ``dropDuplicates`` on doc_id, then the map-only curation
    stages — PII injection + scrub, Gopher-style quality verdict,
    keep-filter, token count — inside the same streaming query
    (append mode, availableNow).  The landed stream is batch-aggregated
    per lang; equality with the single-copy batch twin proves both the
    dedup (counts would double) and the scrub/filter parity.  In
    production the final aggregation would also run streaming behind a
    watermark; it is batch here because the memory sink is the
    recorded artifact."""
    import tempfile

    from ..dataops import curate as cu
    from ..dataops.text import normalize_text
    from ..streaming.windows import documents_stream
    from .curate_queries import _pii_text_spark

    name = f"stream_curation_{next(_stateful_run_counter)}"
    doubled = documents_stream(spark, sf_dir).unionByName(
        documents_stream(spark, sf_dir)
    )
    deduped = doubled.dropDuplicates(["doc_id"])
    t = normalize_text(
        cu.pii_scrub(_pii_text_spark(F.col("doc_id"), F.col("text")))
    )
    w = F.split(t, " ")
    n_tokens = F.size(w).cast("long")
    n_dup = (F.size(w) - F.size(F.array_distinct(w))).cast("long")
    n_word_chars = (F.length(t) - (F.size(w) - 1)).cast("long")
    dup_frac = n_dup / n_tokens
    mean_wl = n_word_chars / n_tokens
    keep = ~(
        (n_tokens < 10)
        | (dup_frac > 0.6)
        | (mean_wl < 3.0)
        | (mean_wl > 10.0)
    )
    curated = deduped.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"), keep.alias("keep")
    ).where(F.col("keep"))
    with sized_state_partitions(spark, sf_dir, "documents"):
        q = (
            curated.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="curate_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    return (
        spark.table(name)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


# ====================================================================
# As-of join (custom operator — Spark lacks a native ASOF)
# ====================================================================

_ASOF_ORACLE = """
WITH e AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
)
SELECT event_id, user_id, us,
       last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                  IGNORE NULLS) OVER w AS last_purchase_id,
       us - last_value(CASE WHEN event_type = 'purchase' THEN us END
                       IGNORE NULLS) OVER w AS us_since_purchase
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


@query("events_asof_last_purchase", _ASOF_ORACLE)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join, Spark-first: for every event, the user's most recent
    STRICTLY-PRIOR 'purchase' event and the elapsed micros.  Spark has
    no native ASOF operator; the scalable re-expression is a per-key
    ordered window with an ignore-nulls last_value over the conditional
    — ONE shuffle on the join key, no range explosion, no sort-merge
    inequality join.  Ties on identical timestamps break on event_id,
    making the operator (and its DuckDB window twin) deterministic —
    which a bare ASOF JOIN on a non-unique time column is not."""
    from ..functions.eventtime import event_micros
    from . import load

    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        event_micros(ev).alias("us"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    purch_id = F.last(
        F.when(F.col("event_type") == "purchase", F.col("event_id")),
        ignorenulls=True,
    ).over(w)
    purch_us = F.last(
        F.when(F.col("event_type") == "purchase", F.col("us")),
        ignorenulls=True,
    ).over(w)
    return e.select(
        "event_id",
        "user_id",
        "us",
        purch_id.alias("last_purchase_id"),
        (F.col("us") - purch_us).alias("us_since_purchase"),
    )


# ====================================================================
# Range (interval) join — bucketed-bin re-expression
# ====================================================================

_RANGE_WIN_US = 600_000_000  # 10 minutes

_RANGE_ORACLE = f"""
WITH e AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
),
err AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'error'),
pur AS (SELECT user_id, us FROM e WHERE event_type = 'purchase')
SELECT err.event_id, err.user_id,
       CAST(count(pur.us) AS BIGINT) AS n_purchases_10m
FROM err LEFT JOIN pur
  ON pur.user_id = err.user_id
 AND pur.us >= err.us - {_RANGE_WIN_US}
 AND pur.us < err.us
GROUP BY err.event_id, err.user_id
"""


@query("events_range_join_purchases", _RANGE_ORACLE)
def events_range_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join, Spark-first: purchases in the 10 minutes
    before each error event, per user.  A naive inequality join is a
    per-key cross product; the scalable re-expression buckets both
    sides into interval-width time bins and equi-joins on (user, bin)
    with each probe row exploded into exactly the TWO bins its window
    can touch — bounded 2× expansion, ordinary hash join, exact
    inequality applied post-join.  The oracle is the naive inequality
    join (fine at corpus scale)."""
    from ..functions.eventtime import event_micros
    from . import load

    W = _RANGE_WIN_US
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        event_micros(ev).alias("us"),
    )
    err = e.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "us"
    )
    pur = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("us").alias("p_us"),
        (F.col("us") / W).cast("long").alias("bin"),
    )
    probe = err.select(
        "event_id",
        "user_id",
        "us",
        F.explode(
            F.array_distinct(
                F.array(
                    ((F.col("us") - W) / W).cast("long"),
                    (F.col("us") / W).cast("long"),
                )
            )
        ).alias("bin"),
    )
    # LEFT join + conditional count: every error row survives its own
    # probe rows (explode always emits >= 1 bin), so the zero-match
    # errors fall out of the same aggregate — the old inner-join +
    # join-back-to-err form paid a third events scan and an extra
    # (event_id, user_id) shuffle just to re-attach the zeros
    return (
        probe.join(pur, ["user_id", "bin"], "left")
        .groupBy("event_id", "user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("p_us") >= F.col("us") - W)
                    & (F.col("p_us") < F.col("us")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_purchases_10m")
        )
    )


# ====================================================================
# Stream-static join (dimension enrichment inside the streaming query)
# ====================================================================

_STREAM_ENRICH_ORACLE = """
SELECT 'seg_' || CAST(user_id % 7 AS VARCHAR) AS segment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
FROM events
GROUP BY 1
"""


@query("stream_static_enrich", _STREAM_ENRICH_ORACLE)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events STREAM joins a static user→segment
    dimension inside the streaming query (Spark re-plans the static side
    per micro-batch; no state is kept for it), then aggregates per
    segment in complete mode.  The dim is built deterministically from
    the corpus's distinct users so the batch twin is SQL-expressible;
    in production it would be any slowly-refreshed lookup table.  The
    dim side stays broadcast-sized — the join adds no shuffle to the
    stream."""
    import tempfile

    from .. import __name__ as _  # noqa: F401  (package anchor)

    name = f"stream_enrich_{next(_stateful_run_counter)}"
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.concat(
                F.lit("seg_"), (F.col("user_id") % 7).cast("string")
            ).alias("segment"),
        )
    )
    stream = events_stream(spark, sf_dir).select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    enriched = stream.join(F.broadcast(users), "user_id")
    agg = enriched.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("vc").cast("long").alias("value_cents"),
    )
    with sized_state_partitions(spark, sf_dir, "events"):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="enrich_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


# ====================================================================
# Stream-static SALTED join (the AQE-less regime where salting pays)
# ====================================================================

_STREAM_SALTED_ORACLE = """
SELECT 'tier_' || CAST(user_id % 5 AS VARCHAR) AS tier,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
FROM events
GROUP BY 1
"""


@query("stream_salted_enrich", _STREAM_SALTED_ORACLE)
def stream_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join through the SALTED plan
    (operators/skew.py salted_broadcastless_join): the r6 crossover
    measurement showed AQE's skew-join split beats explicit salting in
    batch — but AQE does not re-plan STREAMING joins, so a streaming
    fact with hot keys against a non-broadcastable dim is exactly the
    regime the salted join is reserved for (adaptive_join's decision
    notes).  This query pins that the salted shape works under
    Structured Streaming semantics end-to-end: the stream salts
    per-event, the dim replicates into every salt bucket per
    micro-batch, and the post-join per-tier aggregate must equal the
    batch GROUP BY (the oracle).  The dim here is corpus-derived so
    the twin is SQL-expressible; at bench scale it would broadcast —
    the plan SHAPE, not a runtime win at 100k rows, is the contract."""
    import tempfile

    from ..operators.skew import salted_broadcastless_join

    name = f"stream_salted_{next(_stateful_run_counter)}"
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.concat(
                F.lit("tier_"), (F.col("user_id") % 5).cast("string")
            ).alias("tier"),
        )
    )
    stream = events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    enriched = salted_broadcastless_join(
        stream, users, "user_id", n_salts=8, salt_source="event_id"
    )
    agg = enriched.groupBy("tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("vc").cast("long").alias("value_cents"),
    )
    with sized_state_partitions(spark, sf_dir, "events"):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="salted_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


# ====================================================================
# Rolling 7-day DISTINCT users (window count-distinct re-expression)
# ====================================================================

_ROLLING_USERS_ORACLE = """
WITH ud AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
    FROM events
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
days AS (SELECT unnest(generate_series(d0, d1)) AS obs_day FROM bounds)
SELECT CAST(obs_day AS BIGINT) AS obs_day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_7d
FROM days JOIN ud ON ud.day BETWEEN obs_day - 6 AND obs_day
GROUP BY obs_day
"""


@query("events_rolling_7d_users", _ROLLING_USERS_ORACLE)
def events_rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct actives — COUNT(DISTINCT) over a sliding
    frame, which Spark's window functions cannot express.  Scalable
    re-expression: dedup to (user, day), explode each user-day into the
    ≤7 observation days it contributes to (bounded 7× expansion of the
    already-deduped frame — NOT of the fact table), dedup (user,
    obs_day), count per day.  Every step partial-aggregates before its
    shuffle; the oracle is the naive range join DuckDB can afford at
    corpus scale."""
    from ..functions.eventtime import event_micros
    from . import load

    ev = load(spark, sf_dir, "events")
    ud = (
        ev.select("user_id", event_micros(ev).alias("us"))
        .select("user_id", F.expr("us div 86400000000").alias("day"))
        .distinct()
    )
    d1 = ud.agg(F.max("day").alias("d1"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + F.lit(6))
            ).alias("obs_day"),
        )
        .distinct()
        .join(F.broadcast(d1), F.col("obs_day") <= F.col("d1"))
    )
    return contrib.groupBy("obs_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_users_7d")
    ).select(F.col("obs_day").cast("long").alias("obs_day"), "n_users_7d")


# ====================================================================
# Stream-stream join (watermarked, time-bounded self-join)
# ====================================================================

_SS_JOIN_ORACLE = f"""
WITH e AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
),
err AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'error'),
pur AS (SELECT user_id, us FROM e WHERE event_type = 'purchase')
SELECT err.event_id, err.user_id,
       CAST(count(*) AS BIGINT) AS n_purchases_10m
FROM err JOIN pur
  ON pur.user_id = err.user_id
 AND pur.us >= err.us - {_RANGE_WIN_US}
 AND pur.us < err.us
GROUP BY err.event_id, err.user_id
"""


@query("stream_stream_join_purchases", _SS_JOIN_ORACLE)
def stream_stream_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM join: the error stream joins the purchase stream
    on user_id with a time-range condition (purchases in the 10 minutes
    before each error), both sides watermarked so Spark can bound the
    join state and drop expired rows — the streaming twin of the batch
    range join.  Matched pairs land append-mode in a memory sink and
    are counted per error batch-side; the oracle is the naive batch
    inequality join (errors with >= 1 match, inner-join semantics).

    State is keyed on (user_id, 10-minute time bucket), NOT user_id
    alone: the symmetric hash join probes every buffered row of the
    matching key, so a hot user funnels |errors_u| x |purchases_u|
    comparisons into one state partition — the r9 zipf corpus (one
    user holding 28% of all events) drove that past 5x10^9 pairs and
    the availableNow run never finished.  Because the range interval
    equals the bucket width, a matching purchase lives in exactly one
    of {err_bucket, err_bucket-1}: exploding each error into those two
    probe rows makes the bucket an EQUI-join key (each pair still
    matches exactly once), so hot-user state shards across time and
    per-key work is bounded by the user's 10-minute local density at
    any corpus scale."""
    import tempfile

    name = f"ss_join_{next(_stateful_run_counter)}"
    bucket = "CAST(floor(unix_micros({c}) / 600000000) AS LONG)"
    base = events_stream(spark, sf_dir)
    err = (
        event_time(base)
        .where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("err_user"),
            F.col("event_ts").alias("err_ts"),
        )
        .withWatermark("err_ts", "1 hour")
        .withColumn(
            "err_b",
            F.explode(
                F.array(
                    F.expr(bucket.format(c="err_ts")),
                    F.expr(bucket.format(c="err_ts") + " - 1L"),
                )
            ),
        )
    )
    pur = (
        event_time(events_stream(spark, sf_dir))
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("pur_user"),
            F.col("event_ts").alias("pur_ts"),
        )
        .withWatermark("pur_ts", "1 hour")
        .withColumn("pur_b", F.expr(bucket.format(c="pur_ts")))
    )
    joined = err.join(
        pur,
        F.expr(
            "err_user = pur_user AND err_b = pur_b AND "
            "pur_ts >= err_ts - INTERVAL 10 MINUTES AND pur_ts < err_ts"
        ),
    )
    # A stream-stream join materializes FOUR state stores per shuffle
    # partition; at 32 partitions the store setup dominates wall time
    # at bench scale (16s -> 4.5s measured at sf0.1 going 32 -> 8).
    with sized_state_partitions(spark, sf_dir, "events"):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="ssjoin_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(600)
        q.stop()
        if not finished:
            # a timed-out availableNow run leaves a PARTIAL sink — the
            # r9 skew sweep read one as silent 0 rows; fail loudly
            raise RuntimeError(
                f"{name}: stream-stream join did not drain in 600s"
            )
    return (
        spark.table(name)
        .groupBy(
            F.col("err_id").alias("event_id"),
            F.col("err_user").alias("user_id"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases_10m"))
    )


# ====================================================================
# foreachBatch sink (per-micro-batch MERGE into a keyed table)
# ====================================================================

_FOREACH_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
FROM events
GROUP BY user_id
"""


@query("stream_foreachbatch_upsert", _FOREACH_ORACLE)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink: each micro-batch's per-user partial aggregate
    MERGES into a keyed parquet state table via the versioned-state
    sink (``streaming.upsert.VersionedUpsert`` — the canonical pattern
    for sinks with no native streaming writer; see that module for the
    exactly-once / idempotent-replay design and the crash-restart
    certification).  The final version read back from disk must equal
    the plain batch aggregate."""
    import tempfile

    from ..streaming.upsert import VersionedUpsert

    sink = VersionedUpsert(tempfile.mkdtemp(prefix="febatch_state_"))
    stream = events_stream(spark, sf_dir).select("user_id", "value")
    q = (
        stream.writeStream.foreachBatch(sink.merge_batch)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="febatch_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    return sink.final_state(spark)


# ====================================================================
# Streaming Bloom-filter dedup against a historical corpus
# ====================================================================

def _stream_bloom_pos_sql(j: int) -> str:
    from ..dataops.sketches import BLOOM_M
    from ..functions.hashing import MERSENNE_P, MINHASH_COEFFS, md5_int60_sql

    a, b = MINHASH_COEFFS[j]
    norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    x = f"({md5_int60_sql(norm)} % {MERSENNE_P})"
    return f"((({a} * {x} + {b}) % {MERSENNE_P}) % {BLOOM_M})"


def _stream_bloom_oracle() -> str:
    positions = " UNION ALL ".join(
        f"SELECT {_stream_bloom_pos_sql(j)} AS pos FROM history"
        for j in range(4)
    )
    lookups = " UNION ALL ".join(
        f"SELECT doc_id, lang, {_stream_bloom_pos_sql(j)} AS pos"
        " FROM documents"
        for j in range(4)
    )
    return f"""
WITH history AS (
    SELECT text FROM documents WHERE doc_id % 5 <> 4
),
bloom AS (SELECT DISTINCT pos FROM ({positions})),
claims AS (
    SELECT l.doc_id, l.lang,
           CAST(count(b.pos) AS BIGINT) = 4 AS claimed
    FROM ({lookups}) l LEFT JOIN bloom b ON b.pos = l.pos
    GROUP BY l.doc_id, l.lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN claimed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_claimed_dup,
       CAST(sum(CASE WHEN claimed THEN 0 ELSE 1 END) AS BIGINT)
           AS n_novel
FROM claims
GROUP BY lang
"""


@query("stream_bloom_corpus_filter", _stream_bloom_oracle())
def stream_bloom_corpus_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming dedup against HISTORY — the crawl-ingest shape where
    each incoming document is checked against everything already kept
    without joining the corpus into the stream.  The historical Bloom
    filter (built batch-side over normalized text) collapses to a
    16-long bitmask LITERAL, so the streaming side is pure map-side
    expression work: four hash positions, four bit tests, zero
    shuffles, zero stream state for the membership check — exactly how
    a 100 TB corpus filter deploys (the filter, not the corpus, ships
    to executors).  Claimed/novel counts per language aggregate in
    complete mode; the oracle replays the identical bit math in
    DuckDB, so no false negatives AND the exact false-positive set are
    both on the hash."""
    import tempfile

    from ..dataops import sketches as sk
    from ..dataops.text import normalize_text
    from ..streaming.windows import documents_stream

    name = f"stream_bloom_{next(_stateful_run_counter)}"
    history = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 5 != 4)
        .select(normalize_text(F.col("text")).alias("k"))
    )
    positions = [
        r["pos"] for r in sk.bloom_build(history, "k").collect()
    ]
    mask = [0] * (sk.BLOOM_M // 64)
    for pos in positions:
        mask[pos // 64] |= 1 << (pos % 64)
    # two's-complement into signed int64 (a JVM long literal); the
    # (word >> n) & 1 bit test is unaffected by the sign bit
    mask = [w - (1 << 64) if w >= (1 << 63) else w for w in mask]
    mask_col = F.array(*[F.lit(w).cast("long") for w in mask])

    stream = documents_stream(spark, sf_dir).select(
        "doc_id", "lang", normalize_text(F.col("text")).alias("k")
    )
    stream = stream.withColumn("mask", mask_col)
    for j in range(4):
        stream = stream.withColumn(
            f"pos{j}", sk.bloom_position(F.col("k"), j)
        )
    bit_tests = " AND ".join(
        f"(shiftright(element_at(mask, CAST(pos{j} DIV 64 AS INT) + 1),"
        f" CAST(pos{j} % 64 AS INT)) & 1) = 1"
        for j in range(4)
    )
    agg = (
        stream.withColumn("claimed", F.expr(bit_tests))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("claimed"), 1).otherwise(0))
            .cast("long")
            .alias("n_claimed_dup"),
            F.sum(F.when(F.col("claimed"), 0).otherwise(1))
            .cast("long")
            .alias("n_novel"),
        )
    )
    with sized_state_partitions(spark, sf_dir, "documents"):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="sbloom_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


# ====================================================================
# Streaming dedup with BOUNDED state (dropDuplicatesWithinWatermark)
# ====================================================================

@query("stream_dedup_within_watermark", _STREAM_DEDUP_ORACLE)
def stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The scale-correct streaming dedup: ``dropDuplicatesWithinWatermark``
    holds a key only until the 1-hour watermark passes its event time,
    so dedup state is bounded by the redelivery window instead of
    growing with every key ever seen (what plain ``dropDuplicates`` in
    `stream_dedup_ingest` does — correct, but state-unbounded at
    100 TB/day).  Same at-least-once doubled source, same oracle: the
    single-copy batch aggregate — every redelivery lands within the
    watermark, so suppression must be complete."""
    import tempfile

    from pyspark.sql import functions as F

    from ..streaming.stateful import dedup_stream_within_watermark

    name = f"dedup_wm_oracle_{next(_stateful_run_counter)}"
    doubled = events_stream(spark, sf_dir).unionByName(
        events_stream(spark, sf_dir)
    )
    with sized_state_partitions(spark, sf_dir, "events"):
        q = (
            dedup_stream_within_watermark(doubled)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="dedup_wm_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("vc").cast("long").alias("value_cents"),
        )
    )


# ====================================================================
# transformWithStateInPandas (Spark 4 typed-state API)
# ====================================================================
# NOT registered as a driver query: the API's Python worker speaks
# protobuf to the JVM state server, and this runtime ships no protobuf
# (installs are off the table), so a registered query could never earn
# a driver correctness row here.  The operator itself lives on as
# ``streaming.stateful.running_user_stats_tws`` with an actionable
# RuntimeError when protobuf is absent and full end-state-vs-batch
# parity when present (tests/test_streaming.py exercises both sides);
# ``stream_stateful_user_stats`` (applyInPandasWithState, driver-green)
# is the registered stateful representative.


# ====================================================================
# Sketches as streaming state: per-window HLL registers built
# in-stream
# ====================================================================

_STREAM_HLL_ORACLE = """
WITH hashed AS (
    SELECT (epoch_us(ts) // 86400000000) * 86400 AS window_start,
           CAST(((CAST(hash_part AS HUGEINT)) % 64) AS INT) AS bucket,
           hash_part // 64 AS rest
    FROM (
        SELECT ts,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                       1, 15))::BIGINT AS BIGINT)
                   AS hash_part
        FROM events
    )
),
rho AS (
    SELECT window_start, bucket,
           CASE WHEN rest = 0 THEN 55
                ELSE CAST(log2(rest & -rest) AS INT) + 1 END AS r
    FROM hashed
),
regs AS (
    SELECT window_start, bucket, max(r) AS max_rho
    FROM rho GROUP BY window_start, bucket
),
agg AS (
    SELECT window_start,
           CAST(sum(1::BIGINT << (56 - max_rho))
                + (64 - count(*)) * (1::BIGINT << 56) AS BIGINT)
               AS s_scaled,
           CAST(count(*) AS BIGINT) AS n_buckets_hit
    FROM regs GROUP BY window_start
),
exact AS (
    SELECT (epoch_us(ts) // 86400000000) * 86400 AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
    FROM events GROUP BY 1
)
SELECT a.window_start AS window_start, n_buckets_hit, s_scaled,
       (0.7213 / (1 + 1.079 / 64)) * 64 * 64
           * CAST(1::BIGINT << 56 AS DOUBLE) / s_scaled AS hll_estimate,
       n_exact
FROM agg a JOIN exact e ON e.window_start = a.window_start
"""


@query("stream_hll_windowed", _STREAM_HLL_ORACLE)
def stream_hll_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches as streaming state: per-day distinct-user HLL
    REGISTERS built inside a watermarked streaming aggregation
    (groupBy(window, bucket).max(rho) — register updates are monotone
    max, so update-mode emissions converge to the batch registers),
    then the estimate derived from the sink's end state next to the
    exact per-window distinct.  This is the 100 TB cardinality
    pattern: the stream maintains KBs of mergeable state per window
    instead of a distinct set, and the SAME registers roll up to any
    coarser grain later."""
    import tempfile

    from pyspark.sql import functions as F

    from ..functions.hashing import md5_int60

    from ..dataops.sketches import hll_rho

    name = f"hll_windowed_{next(_stateful_run_counter)}"
    stream = event_time(events_stream(spark, sf_dir)).withWatermark(
        "event_ts", "1 hour"
    )
    # shared hash family: the 60-bit md5 is non-negative, so
    # bucket = low 6 bits and rest = the remaining 54 via bit ops
    h = md5_int60(F.col("user_id").cast("string"))
    rest = F.shiftright(h, 6)
    prepped = stream.select(
        F.window("event_ts", "1 day").alias("win"),
        h.bitwiseAND(F.lit(63)).cast("int").alias("bucket"),
        hll_rho(rest).alias("rho"),
    )
    regs = prepped.groupBy("win", "bucket").agg(
        F.max("rho").cast("int").alias("max_rho")
    )
    with sized_state_partitions(spark, sf_dir, "events"):
        q = (
            regs.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="hllw_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    final = (
        spark.table(name)
        .groupBy(
            F.unix_timestamp("win.start").alias("window_start"), "bucket"
        )
        .agg(F.max("max_rho").alias("max_rho"))
    )
    agg = final.groupBy("window_start").agg(
        (
            F.sum(F.expr("shiftleft(1L, 56 - max_rho)"))
            + (F.lit(64) - F.count(F.lit(1))) * F.lit(1 << 56)
        ).cast("long").alias("s_scaled"),
        F.count(F.lit(1)).cast("long").alias("n_buckets_hit"),
    )
    from ..functions.eventtime import event_micros

    ev = load(spark, sf_dir, "events")
    day = (
        (event_micros(ev) / F.lit(86_400_000_000)).cast("long") * 86400
    ).alias("window_start")
    exact = ev.select(day, "user_id").groupBy("window_start").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return (
        agg.join(exact, "window_start")
        .select(
            "window_start",
            "n_buckets_hit",
            "s_scaled",
            (
                F.lit(0.7213 / (1 + 1.079 / 64))
                * 64 * 64 * float(1 << 56)
                / F.col("s_scaled")
            ).alias("hll_estimate"),
            "n_exact",
        )
    )


# ====================================================================
# Streaming DSIR filter (offline model fit, online stream scoring)
# ====================================================================

def _stream_dsir_oracle() -> str:
    """The streaming scorer must land EXACTLY the batch DSIR answer
    (the stream replays the same corpus once) — reuse its oracle."""
    from .curate_queries import _DSIR_ORACLE

    return _DSIR_ORACLE


#: Model memo: dsir_fit is a deterministic pure function of the corpus
#: (same rationale as the IVF codebook caches) — refitting per query
#: execution would re-pay the gram explode + aggregation for an
#: identical ≤4096-row frame.  The MATERIALIZED rows are cached (not
#: the plan), so the streaming side broadcasts a literal local
#: relation.
_DSIR_MODEL_CACHE: dict[str, list] = {}


def _dsir_model(spark: SparkSession, sf_dir: str):
    from ..dataops import curate as cu

    if sf_dir not in _DSIR_MODEL_CACHE:
        _DSIR_MODEL_CACHE[sf_dir] = (
            cu.dsir_fit(
                load(spark, sf_dir, "documents"), F.col("lang") == "en"
            )
            .collect()
        )
    rows = _DSIR_MODEL_CACHE[sf_dir]
    return spark.createDataFrame(
        rows, "bucket long, cr long, ct long, tr long, tt long"
    )


@query("stream_dsir_filter", _stream_dsir_oracle())
def stream_dsir_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection in its production deployment shape: the
    hashed-gram models are fit OFFLINE on the batch corpus
    (dataops.curate.dsir_fit — a bounded ≤4096-row frame), then the
    documents STREAM is scored against the broadcast model
    (dsir_score: explode + stream-static broadcast join, map-only)
    with a complete-mode per-doc aggregate snapshotting the verdict
    ledger.  End state must hash-match the batch dsir_importance_
    weights oracle — the stream == batch contract for model-scored
    ingestion.  At 100 TB the model refreshes offline on a cadence
    while the scorer never re-shuffles the stream."""
    import tempfile

    from ..dataops import curate as cu
    from ..streaming.windows import documents_stream

    name = f"stream_dsir_{next(_stateful_run_counter)}"
    model = _dsir_model(spark, sf_dir)
    per_gram = cu.dsir_score(documents_stream(spark, sf_dir), model)
    ledger = per_gram.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum("bits").cast("long").alias("dsir_bits"),
        F.expr("CAST(sum(bits) * 1000 div count(1) AS BIGINT)").alias(
            "avg_bits_milli"
        ),
        (F.expr("sum(bits) * 1000 div count(1)") > 0).alias("keep"),
    )
    # Size the state partitioning from the source volume (the
    # stream_stream_join lesson: store setup per partition dominates
    # at bench scale; ~64 MB input per state partition, floor 8.
    with sized_state_partitions(spark, sf_dir, "documents"):
        q = (
            ledger.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="dsir_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


# ====================================================================
# Streaming behavioral drift (stream the fact agg, finish on the grid)
# ====================================================================

def _stream_drift_oracle() -> str:
    """End state must equal the batch daily-drift ledger exactly."""
    from .events_queries import _DAILY_DRIFT_ORACLE

    return _DAILY_DRIFT_ORACLE


@query("stream_daily_drift", _stream_drift_oracle())
def stream_daily_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral drift monitoring as a STREAMING composition: the
    only fact-sized work — the (day, event_type) count aggregation —
    runs inside the stream (complete mode, availableNow), and the
    bounded-grid TV arithmetic (days × types, 1-row totals) finishes
    batch-side on the landed counts, matching events_daily_drift's
    oracle bit-for-bit.  The production shape for continuous
    monitoring: state is bounded by days×types, and the expensive
    pass never leaves the stream."""
    import tempfile

    from ..functions.eventtime import event_micros
    from ..streaming.windows import events_stream

    name = f"stream_drift_{next(_stateful_run_counter)}"
    ev = events_stream(spark, sf_dir)
    cnt = (
        ev.select(event_micros(ev).alias("us"), "event_type")
        .select(
            F.expr("CAST(us div 86400000000 AS BIGINT)").alias("day"),
            "event_type",
        )
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    with sized_state_partitions(spark, sf_dir, "events"):
        q = (
            cnt.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="drift_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    # snapshot the memory-sink table once: three consumers re-reference
    # it (days, types, and the grid join), and a streaming memory
    # relation re-referenced in a self-join trips analyzer ambiguity
    landed = spark.table(name).localCheckpoint(eager=True)
    days = landed.groupBy("day").agg(F.sum("n").cast("long").alias("td"))
    types = landed.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("ct")
    )
    tot = types.agg(F.sum("ct").cast("long").alias("t"))
    grid = days.crossJoin(F.broadcast(types)).crossJoin(F.broadcast(tot))
    shares = grid.join(landed, ["day", "event_type"], "left").select(
        "day",
        "td",
        F.expr(
            "CAST(COALESCE(n, 0) * 1000000 div td AS BIGINT)"
        ).alias("day_ppm"),
        F.expr("CAST(ct * 1000000 div t AS BIGINT)").alias("base_ppm"),
    )
    return shares.groupBy("day").agg(
        F.max("td").cast("long").alias("n_events"),
        F.expr(
            "CAST(sum(abs(day_ppm - base_ppm)) div 2 AS BIGINT)"
        ).alias("tv_ppm"),
    )


# ====================================================================
# Streaming image fingerprinting (real codec work in-stream)
# ====================================================================

def _stream_dhash_oracle() -> str:
    """Per-doc fingerprint words, recomputed analytically — the words
    CTE of the batch image-dHash oracle with doc_id carried out."""
    from .dataops_queries import _DHASH_ORACLE

    # the prefix ends mid-CTE-list ("..., words AS (...),"): strip the
    # trailing comma before appending the final SELECT
    prefix = _DHASH_ORACLE.split("\nbands AS (")[0].rstrip().rstrip(",")
    return f"""{prefix}
SELECT doc_id, word FROM words
"""


@query("stream_image_dhash", _stream_dhash_oracle())
def stream_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal hash pass under Structured Streaming: the
    documents stream filters to the image-bearing ids, each micro-batch
    runs the REAL PNG encode→decode→dHash inside Arrow-batched
    mapInPandas (the identical per-item work as the batch
    multimodal_image_dhash_neardup), and the landed per-doc fingerprint
    words must hash-match the analytic oracle.  The continuous-ingest
    shape for media: hash on arrival (map-only, no stream state), match
    against the standing index downstream."""
    import tempfile
    from collections.abc import Iterator

    import pandas as pd

    from ..dataops import multimodal as mmod
    from ..dataops import png as pngc
    from ..streaming.windows import documents_stream

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, words = [], []
            for doc_id in pdf["doc_id"]:
                i64 = int(doc_id)
                g = i64 // 50
                pixels = bytearray(
                    (g * 31 + i * 7) % 256 for i in range(288)
                )
                if i64 % 100 == 10:
                    j0 = i64 % 288
                    pixels[j0] = (pixels[j0] + 64) % 256
                enc = pngc.encode_png(18, 16, 1, bytes(pixels))
                w, h, gray = mmod.decode_image_gray(enc)
                word, _ = mmod.dhash64(w, h, gray)
                ids.append(i64)
                words.append(word)
            yield pd.DataFrame({"doc_id": ids, "word": words})

    name = f"stream_dhash_{next(_stateful_run_counter)}"
    stream = (
        documents_stream(spark, sf_dir)
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        .mapInPandas(run, "doc_id long, word long")
    )
    with sized_state_partitions(spark, sf_dir, "documents"):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="sdhash_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)
