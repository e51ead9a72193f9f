"""Type-adaptive event-time extraction for the ``events`` corpus.

The driver's ``events.parquet`` has shipped ``ts`` as BOTH epoch-nano
INT64 (read as LongType under ``nanosAsLong``) and, currently, as
parquet TIMESTAMP(isAdjustedToUTC=false, MICROS) which PySpark 4.x
surfaces as TIMESTAMP_NTZ.  Every consumer derives epoch **micros**
through :func:`event_micros`, which branches on the *observed* column
type instead of assuming a session conf took effect — the round-3
breakage was exactly a conf (``spark.sql.legacy.parquet.nanosAsLong``)
that silently stopped applying.

Timezone independence: the TIMESTAMP_NTZ branch measures the interval
from the NTZ epoch literal with ``timestampdiff`` — a pure calendar
subtraction with no instant conversion — so the result is identical in
any ``spark.sql.session.timeZone`` and equals DuckDB's
``epoch_us(ts)`` on the same naive values.  (A ``cast(ts as
timestamp)`` + ``unix_micros`` derivation would shift by the session
UTC offset on non-UTC hosts.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Spark SQL literal for the naive epoch (no timezone semantics).
_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def event_micros(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-microseconds Column for ``df[col]``, exact integer math.

    * LongType  → stored epoch **nanos**; truncating ``div 1000``
      (integer — nanos ~1.7e18 exceed double precision).
    * TIMESTAMP_NTZ → micros since the naive epoch via ``timestampdiff``
      (timezone-independent; matches DuckDB ``epoch_us``).
    * TIMESTAMP (instant) → ``unix_micros`` (timezone-independent by
      construction).

    Works on batch and streaming DataFrames alike (schema inspection
    only — no action).
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return F.expr(f"`{col}` div 1000")
    if isinstance(dt, T.TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, `{col}`)"
        )
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col))
    raise TypeError(
        f"events.{col} has unsupported type {dt}; expected epoch-nano "
        "LONG, TIMESTAMP_NTZ, or TIMESTAMP"
    )


def describe_ts_dtype(spark, sf_dir: str) -> str:
    """Canary: the events ``ts`` type as read on THIS environment (for
    bench/correctness provenance lines and the environment-drift test)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return schema["ts"].dataType.simpleString()
