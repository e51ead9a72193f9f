"""Registered queries must self-correct session settings when invoked
with a session that has hostile defaults (the correctness driver uses
its own SparkSession, not the engine factory's)."""

from __future__ import annotations

import pytest


def test_queries_survive_hostile_session(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.ansi.enabled", "true")
    ns.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")

    from credit_card_etl_pipeline_spark.queries import QUERIES

    # ANSI-sensitive (invalid casts) + timezone-sensitive (dates/windows)
    n1 = QUERIES["etl_general_cleanse"](ns, "/root/testdata/sf0.001").count()
    win = QUERIES["events_tumbling_window"](ns, "/root/testdata/sf0.001")
    rows = win.collect()
    assert n1 > 0 and len(rows) > 0
    assert ns.conf.get("spark.sql.ansi.enabled") == "false"
    assert ns.conf.get("spark.sql.session.timeZone") == "UTC"

    # Concrete VALUE pin, not just row counts: the earliest window start
    # must equal the oracle's epoch arithmetic even though the session
    # came in on America/Los_Angeles — a timezone-dependent event-time
    # derivation would shift this by the UTC offset.
    import duckdb

    want = duckdb.sql(
        "SELECT min((epoch_us(ts) // 300000000) * 300) "
        "FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchone()[0]
    assert min(r["window_start"] for r in rows) == want
