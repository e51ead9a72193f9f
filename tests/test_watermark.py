"""Watermark semantics: in append mode, a window only emits once the
watermark passes it, and events arriving later than the watermark are
dropped — exercised with a two-batch file replay."""

from __future__ import annotations

import pandas as pd
import pytest

from credit_card_etl_pipeline_spark.streaming.windows import (
    tumbling_counts,
    with_watermark,
)


@pytest.mark.timeout(300)
def test_late_rows_dropped_in_append_mode(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    base_ns = 1_700_000_000 * 10**9  # some epoch anchor, nanos

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf.to_parquet(src / name)

    minute = 60 * 10**9
    # batch 1: events in windows W0 [0,5min) and W1 [5,10min), then one
    # far-future event at +120min that drags the watermark forward
    write_batch(
        "b1.parquet",
        [
            (1, base_ns + 1 * minute, 10, "click", 1.0, ""),
            (2, base_ns + 6 * minute, 10, "click", 1.0, ""),
            (3, base_ns + 120 * minute, 10, "click", 1.0, ""),
        ],
    )
    # batch 2: a LATE event back in W0 — behind the 1-hour watermark
    # (120min - 60min = 60min > W0's end) → must be dropped
    write_batch(
        "b2.parquet",
        [
            (4, base_ns + 2 * minute, 10, "click", 5.0, ""),
        ],
    )

    from credit_card_etl_pipeline_spark.streaming.windows import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = tumbling_counts(with_watermark(stream, "1 hour"), "5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql("SELECT * FROM wm_test ORDER BY window_start").collect()

    w0_start = base_ns // 10**9 // 300 * 300
    w0 = [r for r in rows if r["window_start"] == w0_start]
    # W0 was finalized by the watermark with ONE event — the late row
    # (value 5.0) did not get in
    assert len(w0) == 1
    assert w0[0]["n_events"] == 1
    assert w0[0]["value_sum"] == 1.0
