"""Bucketed co-located joins (engine scale utility).

Two facts repeatedly joined on the same key (e.g. transactions ↔
per-card enrichments at 100 TB) should not shuffle on every query:
writing both ``bucketBy`` the join key lets Spark plan a sort-merge
join with ZERO Exchange — each bucket pair joins locally.  This module
wraps the write/read pattern and the session settings it depends on.

Usage::

    write_bucketed(tx, "tx_bucketed", keys=["card_no"], buckets=64)
    write_bucketed(enrich, "enrich_bucketed", keys=["card_no"], buckets=64)
    joined = spark.table("tx_bucketed").join(
        spark.table("enrich_bucketed"), "card_no")   # no shuffle

Bucket counts must match on both sides; pick ~(total size / 128 MB)
rounded to a power of two for the target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    keys: list[str],
    buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    table — the co-location contract future joins rely on.  ``path``
    makes it an external table (no warehouse dir needed)."""
    writer = df.write.mode(mode).bucketBy(buckets, *keys)
    writer = writer.sortBy(*(sort_by or keys))
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def enable_bucketed_joins(spark: SparkSession) -> None:
    """Session settings the zero-exchange plan depends on."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    # A broadcast would bypass the bucket co-location; callers comparing
    # plans may also want to lower the broadcast threshold temporarily.
