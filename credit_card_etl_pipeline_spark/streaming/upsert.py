"""Versioned foreachBatch MERGE sink — the canonical pattern for
streaming sinks with no native writer (JDBC, lakehouse MERGE).

Each micro-batch's per-user partial aggregate merges (full-outer +
coalesced sums) into a keyed parquet state table.  State is VERSIONED
per batch (read ``v_N``, write ``v_{N+1}``, never overwrite what you
read), which buys three properties at once:

* the merge stays fully distributed — no driver collect, and no
  read-then-overwrite-the-same-path lineage trap;
* a batch id REPLAYED after a crash simply rewrites its own version
  from the same predecessor — idempotent under checkpoint
  re-delivery, which is exactly Spark's foreachBatch contract
  (at-least-once per batch id, exactly-once end state);
* every version is an audit point (the restart test diffs them).

Exactly-once across a mid-batch crash + restart is certified by
tests/test_stream_restart.py: the sink function is killed AFTER its
state write but before the checkpoint commit, the stream is restarted
from the same checkpoint, and the final state must hash-equal the
plain batch aggregate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedUpsert:
    """Per-user (n_events, value_cents) running totals, merged into
    ``state_root/v{batch_id+1}`` parquet versions by micro-batch."""

    def __init__(self, state_root: str) -> None:
        self.state_root = state_root

    def versions(self) -> list[int]:
        return sorted(
            int(d[1:])
            for d in os.listdir(self.state_root)
            if d.startswith("v")
        )

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        part = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
        prior = [v for v in self.versions() if v < batch_id + 1]
        out = f"{self.state_root}/v{batch_id + 1}"
        if not prior:
            part.write.mode("overwrite").parquet(out)
            return
        cur = s.read.parquet(f"{self.state_root}/v{prior[-1]}")
        c = cur.alias("c")
        p = part.alias("p")
        merged = c.join(
            p, F.col("c.user_id") == F.col("p.user_id"), "full_outer"
        ).select(
            F.coalesce(F.col("c.user_id"), F.col("p.user_id")).alias(
                "user_id"
            ),
            (
                F.coalesce(F.col("c.n_events"), F.lit(0))
                + F.coalesce(F.col("p.n_events"), F.lit(0))
            ).cast("long").alias("n_events"),
            (
                F.coalesce(F.col("c.value_cents"), F.lit(0))
                + F.coalesce(F.col("p.value_cents"), F.lit(0))
            ).cast("long").alias("value_cents"),
        )
        merged.write.mode("overwrite").parquet(out)

    def final_state(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(
            f"{self.state_root}/v{self.versions()[-1]}"
        )
