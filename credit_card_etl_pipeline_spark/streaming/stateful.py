"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_stats`` tracks, per user, a cumulative event count /
value sum and flags "burst" micro-batches where a user's batch value
exceeds ``burst_factor`` × their trailing per-event average — the kind
of per-key evolving state that windowed aggregation can't express
(state spans ALL history, output depends on state *before* the batch).

Batch-mode equivalence: :func:`running_user_stats_batch` computes the
same per-user end-state with a plain aggregation, which the test uses
to pin the stream's final state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("batch_events", T.LongType()),
        T.StructField("burst", T.BooleanType()),
    ]
)


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    prev_n, prev_cents = state.get if state.exists else (0, 0)

    batch_n = 0
    batch_cents = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        batch_cents += int(pdf["vc"].sum())

    new_n = prev_n + batch_n
    new_cents = prev_cents + batch_cents
    state.update((new_n, new_cents))

    # burst: this batch's per-event value > 3x the trailing average
    # (undefined until the user has history → False)
    burst = False
    if prev_n > 0 and batch_n > 0:
        burst = (batch_cents / batch_n) > 3 * (prev_cents / prev_n)

    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [new_n],
            "value_cents": [new_cents],
            "batch_events": [batch_n],
            "burst": [burst],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user update to a (streaming) events frame
    carrying ``event_ts``.  Value sums ride integer cents."""
    prepped = events.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the stream's END state (cumulative totals)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Streaming exact-dedup on ``event_id``: keeps the first arrival of
    every key via Spark's stateful ``dropDuplicates`` — the ingestion-
    time dedup step of a streaming training-data pipeline (at-least-once
    sources redeliver; state holds one compact key per event).  Emits
    append-mode rows carrying integer-cents values."""
    return events.select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    ).dropDuplicates(["event_id"])


def dedup_stream_within_watermark(events: DataFrame) -> DataFrame:
    """Streaming exact-dedup with BOUNDED state: like
    :func:`dedup_stream` but via ``dropDuplicatesWithinWatermark``, so
    a key is only held until the watermark passes its event time —
    the scale-correct variant (plain ``dropDuplicates`` state grows
    with every key ever seen; at 100 TB/day that state never fits).
    Correct whenever redeliveries arrive within the watermark delay,
    which is exactly the at-least-once-source contract."""
    from .windows import event_time

    return (
        event_time(events)
        .withWatermark("event_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("vc"),
        )
    )


# ------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 successor of
# applyInPandasWithState): typed per-key state handles
# ------------------------------------------------------------------

def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """Same per-user cumulative count/value state as
    :func:`running_user_stats`, expressed in the Spark 4
    ``transformWithStateInPandas`` API: state lives in TYPED handles
    (``getValueState`` with a schema) managed by the state store
    rather than one opaque tuple, the processor is an object with
    lifecycle (init/close), and timers/TTL are first-class when
    needed.  Functionally the end state is identical — which is what
    the oracle checks — making this the migration template from the
    older API.

    Runtime gate: the transformWithState Python worker speaks protobuf
    to the JVM state server; without the ``protobuf`` package the
    streaming runner crashes at init with an opaque XXKST, so fail
    here with the actionable message instead."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(the Python worker speaks protobuf to the JVM state "
            "server); this runtime does not ship it — use "
            "running_user_stats (applyInPandasWithState) instead"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n_events LONG, value_cents LONG"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            prev = self._state.get() if self._state.exists() else (0, 0)
            batch_n = 0
            batch_cents = 0
            for pdf in rows:
                batch_n += len(pdf)
                batch_cents += int(pdf["vc"].sum())
            new_n = prev[0] + batch_n
            new_cents = prev[1] + batch_cents
            self._state.update((new_n, new_cents))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [new_n],
                    "value_cents": [new_cents],
                }
            )

        def close(self) -> None:
            pass

    prepped = events.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    return prepped.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType="user_id LONG, n_events LONG, value_cents LONG",
        outputMode="Update",
        timeMode="None",
    )
