"""Windowed event-stream aggregations (tumbling / sliding / session).

Batch/stream symmetric: each aggregation is a pure ``DataFrame →
DataFrame`` function; feed it ``spark.read`` for batch backfill or
:func:`events_stream` for the live path.  Money-style ``value`` sums
go through integer cents (exact, associative) so stream, batch, and
the DuckDB oracle agree bit-for-bit.

Watermarking: streaming callers attach ``withWatermark`` before the
aggregation (see :func:`with_watermark`); 1 hour tolerates the driver
corpus's out-of-order arrival while bounding state.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.eventtime import event_micros

#: Schema of a LEGACY events feed carrying epoch-nano longs (kept for
#: synthesizing nano-long test fixtures; the live corpus now ships
#: TIMESTAMP_NTZ micros and :func:`events_stream` reads the schema off
#: the file footer instead of assuming either shape).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch nanos
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def event_time(df: DataFrame) -> DataFrame:
    """Append ``event_ts`` (timestamp) from ``ts``, whatever type the
    source shipped (epoch-nano LONG / TIMESTAMP_NTZ / TIMESTAMP) —
    exact integer micros via :func:`event_micros`, never a float path."""
    return df.withColumn(
        "event_ts", F.timestamp_micros(event_micros(df))
    )


def _spread(
    spark: SparkSession, df: DataFrame, key: str | None = None
) -> DataFrame:
    """Spread the per-trigger batch across the cluster — by a
    deterministic hash on ``key`` when given (skips keyless
    round-robin's sort-before-repartition, ~60% of the exchange cost
    at bench volume, and stays retry-safe — guide §2.5), else
    round-robin.

    With ``maxFilesPerTrigger=1`` every micro-batch is ONE file, and a
    single-row-group parquet file scans as ONE task — so without this
    exchange the whole downstream per-row compute (gram explodes, md5
    hashing, decode UDFs) runs single-threaded no matter how many
    cores the cluster has (measured: the DSIR stream scorer's addBatch
    was 8.8 s single-task vs the same work ~2 s spread, sf0.1).  The
    shuffle moved is bounded by the trigger's file cap — one file per
    batch — so at any corpus scale this costs ≤ one file of exchange
    and buys full-cluster parallelism on the expensive transforms.
    The batch path's ``queries.load`` has the same guard; like its
    ``SPARK_GRAFT_NO_SCAN_SPREAD``, set ``SPARK_GRAFT_NO_STREAM_SPREAD``
    to measure the raw source shape in byte-accounting audits."""
    import os

    if os.environ.get("SPARK_GRAFT_NO_STREAM_SPREAD"):
        return df
    n = spark.sparkContext.defaultParallelism
    if key is not None:
        return df.repartition(n, F.col(key))
    return df.repartition(n)


#: Target bytes of source input per micro-batch: small part files
#: coalesce into one trigger (a 32-part Spark-written table would
#: otherwise run 32 micro-batches, paying per-batch planning + the
#: spread exchange 32 times — measured +4s on light aggregations at
#: 10x volume), while a big file still streams one per trigger.
_TRIGGER_TARGET_BYTES = 64 << 20


def files_per_trigger(sizes: list[int]) -> int:
    """Files per micro-batch so each trigger carries roughly
    ``_TRIGGER_TARGET_BYTES`` of input: ceil(target / avg file size),
    clamped to [1, 128].  An empty or zero-size listing hits the 128
    cap — such files carry no rows, so batching many per trigger is
    the harmless direction."""
    import math

    avg = max(1, sum(sizes) // max(1, len(sizes)))
    return min(128, max(1, math.ceil(_TRIGGER_TARGET_BYTES / avg)))


def _table_stream(
    spark: SparkSession, sf_dir: str, table: str, schema: T.StructType
) -> DataFrame:
    """File-source readStream over ``<sf_dir>/<table>.parquet``,
    whichever layout it is: a single FILE (the driver corpus) streams
    via a pathGlobFilter on the parent dir; a DIRECTORY (a
    Spark-written table) streams its part files directly — a glob on
    the parent would match zero files inside the subdirectory and the
    stream would silently read nothing (found by the 10x soak).

    ``maxFilesPerTrigger`` is sized from the table's actual file sizes
    so each micro-batch carries ~``_TRIGGER_TARGET_BYTES`` of input
    regardless of how the table was chunked; file order stays
    deterministic, so replays are too."""
    import os

    path = f"{sf_dir}/{table}.parquet"
    if os.path.isdir(path):
        sizes = [
            e.stat().st_size
            for e in os.scandir(path)
            if e.is_file() and e.name.endswith(".parquet")
        ]
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger(sizes))
            .parquet(path)
        )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", f"{table}.parquet")
        .parquet(sf_dir)
    )


def table_bytes(sf_dir: str, table: str) -> int:
    """On-disk bytes of ``<sf_dir>/<table>.parquet`` (file or
    directory layout)."""
    import os

    path = f"{sf_dir}/{table}.parquet"
    try:
        if os.path.isdir(path):
            return sum(
                e.stat().st_size for e in os.scandir(path) if e.is_file()
            )
        return os.path.getsize(path)
    except OSError:
        return 0


@contextlib.contextmanager
def sized_state_partitions(
    spark: SparkSession,
    sf_dir: str,
    table: str = "events",
    *,
    no_data_batches: bool = False,
):
    """Scope ``spark.sql.shuffle.partitions`` — which fixes a streaming
    query's STATE STORE partition count at first start — to ~64 MB of
    source input per partition, floor 8, capped at the session default.

    State-store setup cost is per partition per micro-batch; at bench
    volume 32 near-empty stores dominate the stateful queries' wall
    time (measured: 3.6s → 1.3s on the applyInPandasWithState query
    just from 32 → 8 partitions), while on a real cluster the count
    grows with the data until the session default caps it.  The conf
    binds only when the stream first starts (fresh checkpoint each
    run) and is restored on exit, so batch plans are untouched.

    ``no_data_batches=False`` (default) additionally scope-disables
    ``spark.sql.streaming.noDataMicroBatches.enabled``: after the last
    data batch, a watermarked stateful query otherwise runs one EXTRA
    empty micro-batch purely to advance the watermark (state eviction
    + append-mode window finalization) — measured ~2s wall at bench
    volume (r12: stream_hll_windowed batch 1: 0 rows, addBatch 1.8s,
    ≈40% of the query).  Every query under this manager is
    output-neutral to that batch: complete/update sinks re-emit or
    have already emitted, dedup and inner stream-stream joins emit on
    arrival, and the applyInPandasWithState operator uses NoTimeout
    (no timer to fire).  An APPEND-MODE WINDOWED AGGREGATION would
    lose its final windows — such a query must pass
    ``no_data_batches=True`` (none are registered today; the flag is
    the guard rail)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    ndb_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_ndb = spark.conf.get(ndb_key, "true")
    parts = max(8, min(int(prev), table_bytes(sf_dir, table) // (64 << 20)))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        if not no_data_batches:
            spark.conf.set(ndb_key, "false")
        yield parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(ndb_key, prev_ndb)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source readStream over the events parquet (one-file-per-
    trigger keeps replays deterministic).

    The file source requires a declared schema; declaring the WRONG
    ``ts`` type (LongType over a TIMESTAMP_NTZ-micros file) silently
    reads raw micros and compresses every timestamp 1000× — so the
    schema is taken from the actual parquet footer via a one-off batch
    read (driver-side metadata only, no data scan)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    from ..functions.contracts import valid_events

    # same row-validity contract the batch read point (queries.load)
    # applies — stream and batch must agree on which rows exist
    return valid_events(
        _spread(spark, _table_stream(spark, sf_dir, "events", schema), "event_id")
    )


def with_watermark(df: DataFrame, delay: str = "1 hour") -> DataFrame:
    return event_time(df).withWatermark("event_ts", delay)


#: Schema of the driver's documents table (for the streaming-ingest
#: curation path; file source requires a declared schema).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source readStream over the documents parquet (spread
    across the cluster per trigger — see :func:`_spread`)."""
    return _spread(
        spark, _table_stream(spark, sf_dir, "documents", DOCUMENTS_SCHEMA),
        "doc_id",
    )


def _value_cents() -> F.Column:
    return F.round(F.col("value") * 100).cast("long")


def tumbling_counts(df: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Tumbling event-time window per event_type: row count + exact
    value sum.  ``df`` must already carry ``event_ts`` (and a watermark
    when streaming)."""
    w = F.window("event_ts", width)
    return (
        df.withColumn("vc", _value_cents())
        .groupBy(w.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("vc").alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "event_type",
            "n_events",
            (F.col("value_cents") / 100.0).alias("value_sum"),
        )
    )


def sliding_counts(
    df: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding window (each event lands in width/slide windows)."""
    w = F.window("event_ts", width, slide)
    return (
        df.withColumn("vc", _value_cents())
        .groupBy(w.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("vc").alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "event_type",
            "n_events",
            (F.col("value_cents") / 100.0).alias("value_sum"),
        )
    )


def session_counts(df: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: activity separated by < ``gap`` fuses
    into one session (Spark's native session_window keeps this a
    streaming-capable stateful aggregation without custom state)."""
    return (
        df.groupBy(
            F.session_window("event_ts", gap).alias("win"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("session_start"),
            F.unix_timestamp(F.col("win.end")).alias("session_end"),
            "user_id",
            "n_events",
        )
    )
