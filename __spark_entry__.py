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

    Ordering (the driver samples a prefix of this dict each round, so
    ordering decides where the per-round check budget goes):

    1. queries whose LATEST driver row is a failure (stale-red: a fix
       made since that round gets re-checked FIRST instead of carrying
       a stale red row — the round-4/5 process bug was putting these
       behind never-verified entries),
    2. queries with no driver correctness row in any committed
       CORRECTNESS_r*.json (never verified), in registration order,
    3. previously-green queries, least-recently-verified round first,
       so old greens rotate back through the sample and regressions
       in already-verified queries still get caught.

    Within each tier, registration order is preserved (stable sort).
    """
    ordered = order_for_sampling(list(q.QUERIES), load_driver_history())
    return {name: q.QUERIES[name] for name in ordered}


def load_driver_history() -> dict[str, tuple[int, bool]]:
    """name -> (round_index_of_latest_row, latest_row_was_green) from
    the committed CORRECTNESS_r*.json files."""
    import glob
    import json
    import os

    latest: dict[str, tuple[int, bool]] = {}
    root = os.path.dirname(os.path.abspath(__file__))
    for rnd, path in enumerate(
        sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    ):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                latest[name] = (rnd, False)
                continue
            green = (
                bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                and not row.get("err")
                # hash_match is None for rows-only (no-oracle) checks;
                # only an explicit False is a failure.
                and row.get("hash_match") is not False
            )
            latest[name] = (rnd, green)
    return latest


def order_for_sampling(
    names: list[str], latest: dict[str, tuple[int, bool]]
) -> list[str]:
    """Pure tier ordering (see queries() docstring): stale-red first,
    then never-verified in registration order, then greens
    least-recently-verified first; registration order within ties."""

    def tier(name: str) -> tuple[int, int]:
        if name not in latest:
            return (1, 0)  # never verified: after stale-reds
        rnd, green = latest[name]
        if not green:
            return (0, rnd)  # latest row is a failure: re-check FIRST
        return (2, rnd)  # green: least-recently-verified first

    return sorted(names, key=tier)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names)."""
    return dict(q.ORACLES)
