"""Streaming failure injection: kill a stream mid-batch, restart from
the SAME checkpoint, and verify exactly-once end state (VERDICT r9
ask #2).

Both tests run a multi-micro-batch file source (events split into 5
part files, ``maxFilesPerTrigger=1``) and inject a crash in the
driver-side foreachBatch function AFTER the batch's state/output write
but BEFORE Spark commits the batch to the checkpoint — the worst-case
window: the restarted query re-delivers the same batch id, and only an
idempotent sink keeps the end state exactly-once.

* ``test_foreachbatch_upsert_restart_exactly_once`` — the versioned
  MERGE sink (streaming.upsert.VersionedUpsert): the replayed batch
  rewrites its own version from the same predecessor, so the final
  state equals the plain batch aggregate bit-for-bit.
* ``test_stateful_restart_recovers_state`` — applyInPandasWithState
  (streaming.stateful.running_user_stats): per-user cumulative state
  must be RESTORED from the checkpointed state store on restart (a
  state reset would double-count the replayed batch's history and the
  final cumulative totals would diverge from the batch aggregate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException

from credit_card_etl_pipeline_spark.streaming.stateful import (
    running_user_stats,
    running_user_stats_batch,
)
from credit_card_etl_pipeline_spark.streaming.upsert import VersionedUpsert

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 5


@pytest.fixture(scope="module")
def split_events(spark, tmp_path_factory):
    """Events table rewritten as N_FILES part files so the file source
    yields one micro-batch per file."""
    src = str(tmp_path_factory.mktemp("restart_src") / "events")
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df.repartition(N_FILES).write.parquet(src)
    return src, df.schema


def _one_file_stream(spark, src, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _crash_after(fn, crash_batch: int, armed: list):
    """Wrap a foreachBatch fn: run it, then raise on ``crash_batch``
    while ``armed`` is truthy — the write lands, the commit doesn't."""

    def wrapped(batch_df, batch_id):
        fn(batch_df, batch_id)
        if armed and batch_id == crash_batch:
            raise RuntimeError("injected mid-batch crash (post-write)")

    return wrapped


def _expected(spark):
    return {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
        .collect()
    }


def test_foreachbatch_upsert_restart_exactly_once(
    spark, split_events, tmp_path
):
    src, schema = split_events
    ckpt = str(tmp_path / "ckpt")
    sink = VersionedUpsert(str(tmp_path))
    armed = [True]

    def start(fn):
        return (
            _one_file_stream(spark, src, schema)
            .select("user_id", "value")
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start(_crash_after(sink.merge_batch, 1, armed))
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(300)
    # the crashed batch's write landed but its commit didn't
    crashed_versions = sink.versions()
    assert 2 in crashed_versions and max(crashed_versions) == 2

    armed.clear()
    q = start(sink.merge_batch)
    assert q.awaitTermination(300)
    q.stop()

    # all batches landed exactly once: versions are contiguous and the
    # final state equals the batch aggregate bit-for-bit
    assert sink.versions() == list(range(1, N_FILES + 1))
    got = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in sink.final_state(spark).collect()
    }
    assert got == _expected(spark)


def test_stateful_restart_recovers_state(spark, split_events, tmp_path):
    src, schema = split_events
    ckpt = str(tmp_path / "ckpt")
    out_root = tmp_path / "updates"
    out_root.mkdir()
    armed = [True]

    def write_updates(batch_df, batch_id):
        # idempotent per-batch landing zone (replays overwrite)
        batch_df.write.mode("overwrite").parquet(
            str(out_root / f"b{batch_id}")
        )

    def start(fn):
        stream = running_user_stats(
            _one_file_stream(spark, src, schema)
        )
        return (
            stream.writeStream.foreachBatch(fn)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start(_crash_after(write_updates, 1, armed))
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(300)

    armed.clear()
    q = start(write_updates)
    assert q.awaitTermination(300)
    q.stop()

    # cumulative state carried across the restart: each user's
    # highest-n_events update row must equal the batch aggregate (a
    # state reset on restart would leave every user's max short of
    # their true total)
    updates = spark.read.parquet(str(out_root / "b*"))
    final = (
        updates.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_events", "value_cents"), F.col("n_events")
            ).alias("s")
        )
        .select("user_id", "s.n_events", "s.value_cents")
    )
    got = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in final.collect()
    }
    assert got == _expected(spark)
