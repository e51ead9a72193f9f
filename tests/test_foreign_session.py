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
    n2 = QUERIES["events_tumbling_window"](ns, "/root/testdata/sf0.001").count()
    assert n1 > 0 and n2 > 0
    assert ns.conf.get("spark.sql.ansi.enabled") == "false"
    assert ns.conf.get("spark.sql.session.timeZone") == "UTC"
