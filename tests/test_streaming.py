"""Structured Streaming equivalence: replaying the events table through
readStream + watermark must produce exactly the batch aggregation."""

from __future__ import annotations

import pytest

from credit_card_etl_pipeline_spark.streaming.windows import (
    event_time,
    events_stream,
    tumbling_counts,
    with_watermark,
)

SF = "/root/testdata/sf0.001"


def _as_set(rows):
    return {
        (r["window_start"], r["event_type"], r["n_events"], r["value_sum"])
        for r in rows
    }


@pytest.mark.timeout(300)
def test_stream_equals_batch_sessions(spark, tmp_path):
    from credit_card_etl_pipeline_spark.streaming.windows import session_counts

    stream = with_watermark(events_stream(spark, SF), "1 hour")
    agg = session_counts(stream, "10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("session_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    stream_rows = {
        (r["session_start"], r["session_end"], r["user_id"], r["n_events"])
        for r in spark.sql("SELECT * FROM session_test").collect()
    }
    batch_rows = {
        (r["session_start"], r["session_end"], r["user_id"], r["n_events"])
        for r in session_counts(
            event_time(spark.read.parquet(f"{SF}/events.parquet")), "10 minutes"
        ).collect()
    }
    assert stream_rows == batch_rows
    assert stream_rows


@pytest.mark.timeout(300)
def test_stream_equals_batch_tumbling(spark, tmp_path):
    stream = with_watermark(events_stream(spark, SF), "1 hour")
    agg = tumbling_counts(stream, "5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    stream_rows = spark.sql("SELECT * FROM tumbling_test").collect()

    batch = tumbling_counts(
        event_time(spark.read.parquet(f"{SF}/events.parquet")), "5 minutes"
    ).collect()

    assert _as_set(stream_rows) == _as_set(batch)
    assert len(stream_rows) > 0


def test_transform_with_state_gated_or_parity(spark):
    """transformWithStateInPandas needs protobuf: without it the
    operator must fail fast with the actionable message; with it, the
    end state must match the batch aggregation (activates the moment
    the dependency appears in the runtime)."""
    import tempfile

    import pytest as _pytest
    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.streaming.stateful import (
        running_user_stats_batch,
        running_user_stats_tws,
    )
    from credit_card_etl_pipeline_spark.streaming.windows import (
        event_time,
        events_stream,
    )

    sf = "/root/testdata/sf0.001"
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with _pytest.raises(RuntimeError, match="protobuf"):
            running_user_stats_tws(
                event_time(events_stream(spark, sf))
            )
        return

    q = (
        running_user_stats_tws(event_time(events_stream(spark, sf)))
        .writeStream.format("memory")
        .queryName("tws_parity")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="tws_t_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    got = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in spark.table("tws_parity")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in running_user_stats_batch(
            spark.read.parquet(f"{sf}/events.parquet")
        ).collect()
    }
    assert got == want


def test_tws_never_registered():
    """The tws query is retired from the registry: this runtime ships
    no protobuf, so the query could never earn a driver correctness
    row — the registry must contain only driver-verifiable queries.
    The operator survives (running_user_stats_tws, tested above);
    stream_stateful_user_stats is the registered stateful twin."""
    from credit_card_etl_pipeline_spark import queries as q

    assert "stream_user_stats_tws" not in q.QUERIES
    assert "stream_user_stats_tws" not in q.ORACLES
    assert "stream_stateful_user_stats" in q.QUERIES


def test_stream_sources_spread_per_trigger(spark, monkeypatch):
    """The file-source streams repartition each micro-batch across the
    cluster (one file per trigger scans as one task otherwise; see
    streaming/windows._spread) — and the audit toggle removes the
    exchange so byte-accounting measures the raw source."""
    from credit_card_etl_pipeline_spark.streaming.windows import (
        documents_stream,
        events_stream,
    )

    sf = "/root/testdata/sf0.001"
    for src in (documents_stream, events_stream):
        monkeypatch.delenv("SPARK_GRAFT_NO_STREAM_SPREAD", raising=False)
        plan = src(spark, sf)._jdf.queryExecution().logical().toString()
        assert "Repartition" in plan, plan
        monkeypatch.setenv("SPARK_GRAFT_NO_STREAM_SPREAD", "1")
        plan = src(spark, sf)._jdf.queryExecution().logical().toString()
        assert "Repartition" not in plan, plan


def test_stream_reads_directory_shaped_tables(spark, tmp_path):
    """A Spark-written table is a DIRECTORY of part files; the stream
    source must read those parts (the parent-dir glob matched zero
    files inside and streamed nothing — caught by the 10x soak), and
    size maxFilesPerTrigger from real file sizes."""
    import shutil

    from credit_card_etl_pipeline_spark.streaming.windows import (
        documents_stream,
    )

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "corpus")
    # directory layout: re-write the documents table via Spark, 4 parts
    docs = spark.read.parquet(f"{src}/documents.parquet")
    n = docs.count()
    docs.repartition(4).write.parquet(f"{d}/documents.parquet")

    out = f"stream_dir_test_{abs(hash(d)) % 100000}"
    q = (
        documents_stream(spark, d)
        .groupBy()
        .count()
        .writeStream.format("memory")
        .queryName(out)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.table(out).collect()[0]["count"]
    shutil.rmtree(d, ignore_errors=True)
    assert got == n, (got, n)


def test_files_per_trigger_sizing():
    from credit_card_etl_pipeline_spark.streaming.windows import (
        _TRIGGER_TARGET_BYTES,
        files_per_trigger,
    )

    mb = 1 << 20
    assert files_per_trigger([]) == 128  # degenerate: no files listed
    assert files_per_trigger([0]) == 128  # zero-size part
    assert files_per_trigger([256 * mb]) == 1  # big file: one per batch
    assert files_per_trigger([2 * mb] * 32) == 32  # 32 small parts: one batch
    assert files_per_trigger([64 * mb]) == 1
    assert files_per_trigger([32 * mb, 32 * mb]) == 2
    # clamp: thousands of tiny files never exceed 128 per trigger
    assert files_per_trigger([1024] * 10_000) == 128
    # target is respected within one file's granularity
    n = files_per_trigger([10 * mb] * 100)
    assert 6 <= n <= 7 and n * 10 * mb >= _TRIGGER_TARGET_BYTES - 10 * mb


@pytest.mark.timeout(300)
def test_no_data_batch_suppressed_state_unchanged(spark, tmp_path):
    """sized_state_partitions scope-disables the trailing no-data
    micro-batch (r12: ~2s of pure watermark-advance wall per stateful
    query at bench volume).  Pin both halves of the contract: the
    batch count drops to exactly the data batches, and a watermarked
    UPDATE-mode aggregation's end state still equals the batch
    aggregate (update sinks emit per data batch, so the extra batch
    was output-neutral)."""
    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.streaming.windows import (
        sized_state_partitions,
    )

    stream = with_watermark(events_stream(spark, SF), "1 hour")
    agg = stream.groupBy(
        F.window("event_ts", "1 day").alias("win")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    with sized_state_partitions(spark, SF, "events"):
        assert (
            spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
            == "false"
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("ndb_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_ndb"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        progress = list(q.recentProgress)
        q.stop()
    # conf restored on exit
    assert (
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        == "true"
    )
    # only DATA batches ran: the single-file sf0.001 source is one
    # micro-batch, and no trailing 0-row watermark batch follows
    assert [p["numInputRows"] > 0 for p in progress] == [True] * len(progress)
    got = {
        (r["win"]["start"], r["n"])
        for r in spark.table("ndb_test").collect()
    }
    want = {
        (r["win"]["start"], r["n"])
        for r in event_time(spark.read.parquet(f"{SF}/events.parquet"))
        .groupBy(F.window("event_ts", "1 day").alias("win"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want and got
