"""Incremental exactly-once file sink: re-triggering a checkpointed
stream over a grown source directory appends only the new data."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from credit_card_etl_pipeline_spark.streaming.windows import EVENTS_SCHEMA, event_time


def _write_events(path, start_id, n, base_ns):
    minute = 60 * 10**9
    pdf = pd.DataFrame(
        [
            (i, base_ns + i * minute, i % 3, "click", float(i), "")
            for i in range(start_id, start_id + n)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf.to_parquet(path)


def _run_once(spark, src, sink, ckpt):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = event_time(stream).select("event_id", "user_id", "value", "event_ts")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)


@pytest.mark.timeout(300)
def test_incremental_append_no_duplicates(spark, tmp_path):
    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    base_ns = 1_700_000_000 * 10**9

    _write_events(src / "a.parquet", 0, 10, base_ns)
    _run_once(spark, src, sink, ckpt)
    first = spark.read.parquet(str(sink))
    assert first.count() == 10

    # grow the source; SAME checkpoint → only the new file is processed
    _write_events(src / "b.parquet", 100, 5, base_ns)
    _run_once(spark, src, sink, ckpt)
    final = spark.read.parquet(str(sink))
    assert final.count() == 15
    assert final.select("event_id").distinct().count() == 15  # no dupes
    assert final.where(F.col("event_id") >= 100).count() == 5
