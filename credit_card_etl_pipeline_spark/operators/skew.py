"""Skew-resistant aggregation (engine scale utility).

AQE's skew-join splitting handles joins, but a heavily skewed
``groupBy`` key (one merchant with 10⁹ rows) still funnels one hash
partition into one task at the final aggregate.  ``salted_aggregate``
implements the classic two-stage fix: explode the hot key over
``n_salts`` sub-keys, partially aggregate per (key, salt), then combine
partials per key — the heavy key's work spreads across ``n_salts``
tasks, at the cost of one extra (tiny, |keys|×n_salts) shuffle.

Only algebraic aggregates decompose this way; the helper supports the
sum/count/min/max family (and count-distinct via a two-level groupBy).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SaltedAgg:
    """One algebraic aggregate: ``partial`` runs per (key, salt),
    ``combine`` merges partials per key."""

    out: str
    partial: Column
    combine_fn: str  # sum | min | max

    def combine(self) -> Column:
        return getattr(F, self.combine_fn)(F.col(self.out)).alias(self.out)


def salted_sum(col: str, out: str | None = None) -> SaltedAgg:
    return SaltedAgg(out or f"sum_{col}", F.sum(col).alias(out or f"sum_{col}"), "sum")


def salted_count(out: str = "n") -> SaltedAgg:
    return SaltedAgg(out, F.count(F.lit(1)).alias(out), "sum")


def salted_min(col: str, out: str | None = None) -> SaltedAgg:
    return SaltedAgg(out or f"min_{col}", F.min(col).alias(out or f"min_{col}"), "min")


def salted_max(col: str, out: str | None = None) -> SaltedAgg:
    return SaltedAgg(out or f"max_{col}", F.max(col).alias(out or f"max_{col}"), "max")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[SaltedAgg],
    *,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage skew-spread groupBy.

    ``salt_source``: a column whose hash spreads rows of the same key
    across salts (defaults to a random salt via ``rand``-free
    monotonically varying ``spark_partition_id``+row-derived hash —
    deterministic when a source column is given, which tests rely on).
    """
    if salt_source is not None:
        salt = (F.xxhash64(F.col(salt_source)) % n_salts + n_salts) % n_salts
    else:
        salt = F.spark_partition_id() % n_salts
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[a.partial for a in aggs])
    )
    return partial.groupBy(*keys).agg(*[a.combine() for a in aggs])


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    *,
    out: str = "n_distinct",
) -> DataFrame:
    """Exact count-distinct that never funnels a hot key into one task:
    stage 1 dedups (key, value) pairs — the value spreads the hash
    space — stage 2 counts per key."""
    pairs = df.select(*keys, distinct_col).distinct()
    return pairs.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias(out))


def salted_broadcastless_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-resistant equi-join for when the dim side is too big to
    broadcast and the fact side has hot keys: the fact salts each row
    into one of ``n_salts`` buckets (derived from ``salt_source`` so
    the assignment is deterministic), the dim replicates every row into
    ALL buckets, and the join keys on (key, salt) — a hot fact key now
    spreads over ``n_salts`` tasks instead of melting one.

    Cost model: dim-side rows × n_salts extra shuffle volume buys
    fact-side hot keys split n_salts ways — the right trade when
    |dim| ≪ |fact| but above the broadcast threshold.  (AQE's runtime
    skew-join split covers sort-merge joins; this explicit form also
    pre-spreads the SHUFFLE itself, which AQE cannot.)"""
    salt_col = (
        F.abs(F.hash(F.col(salt_source))) % n_salts
        if salt_source
        else F.floor(F.rand(seed=7) * n_salts).cast("int")
    )
    salted_fact = fact.withColumn("__salt", salt_col)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(salted_dim, [key, "__salt"]).drop("__salt")
