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
