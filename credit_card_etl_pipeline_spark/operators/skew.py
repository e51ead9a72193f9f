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


def hot_keys(
    df: DataFrame,
    keys: list[str],
    *,
    min_count: int,
) -> DataFrame:
    """The key tuples whose row count exceeds ``min_count`` — the set
    the hot-only salted plan spreads.  Bounded by construction:
    at most total/min_count rows can exceed min_count, and the caller
    derives min_count from the even per-partition load, so the result
    is ≤ shuffle_partitions/factor rows at ANY data size — always
    broadcastable.  The count groupBy combines map-side (hot keys cost
    one partial per input partition)."""
    return (
        df.select(*keys)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__hot_n"))
        .where(F.col("__hot_n") > min_count)
        .drop("__hot_n")
    )


def probe_key_skew(df: DataFrame, keys: list[str]) -> dict:
    """One bounded action: the per-key count histogram reduced to
    (total rows, distinct keys, hottest-key count) — three longs to the
    driver, never the histogram itself.

    The probe is itself skew-immune: a count-per-key groupBy combines
    map-side, so the hot key contributes at most one partial row per
    input partition regardless of its row count; and it scans ONLY the
    key columns, so with columnar storage its cost is a fraction of the
    aggregate it gates.  This is the programmatic twin of the
    events_skew_diagnostics report."""
    row = (
        df.select(*keys)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum("n").cast("long").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("n").cast("long").alias("max_n"),
        )
        .first()
    )
    return {
        "total": int(row["total"] or 0),
        "n_keys": int(row["n_keys"] or 0),
        "max_n": int(row["max_n"] or 0),
    }


#: Salt a COMBINE-FREE aggregate when the hottest key exceeds this
#: multiple of the even per-partition load (total/shuffle_partitions).
#: Set from measurement (tools/soak_adaptive.py + its pandas-UDAF
#: variant, 10M rows, 1024 keys, hot-share sweep 0-50%, local[32]):
#:
#: * algebraic JVM aggregates (sum/count/min/max): the salted plan
#:   NEVER won at any hot share (x_even up to 16) — Spark's map-side
#:   partial aggregation already collapses the hot key to one partial
#:   row per input partition, so the final task receives ~|partitions|
#:   rows however hot the key is.  Plain is always right there.
#: * combine-free payloads (pandas grouped-agg UDAF — no partial
#:   aggregation, every hot-key row shuffles to ONE task): salted won
#:   from x_even ~= 8 (25% hot share: 2.01s vs 2.11s) and above; plain
#:   won at x_even <= ~4.  The crossover sits between, hence 6.
HOT_PARTITION_FACTOR = 6.0


def choose_agg_strategy(
    stats: dict,
    shuffle_partitions: int,
    *,
    combine_free: bool,
    hot_partition_factor: float = HOT_PARTITION_FACTOR,
) -> bool:
    """True = salt.  Pure decision rule over a probe_key_skew report.

    Aggregates with map-side combine are measured skew-immune (see
    HOT_PARTITION_FACTOR notes) — never salted.  Combine-free payloads
    salt when the hottest key alone exceeds ``hot_partition_factor``
    times the perfectly-even per-partition load, i.e. when its single
    reduce task would be the stage straggler."""
    if not combine_free or stats["total"] <= 0:
        return False
    even = stats["total"] / max(shuffle_partitions, 1)
    return stats["max_n"] > hot_partition_factor * even


def adaptive_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[SaltedAgg],
    *,
    combine_free: bool = False,
    n_salts: int = 16,
    salt_source: str | None = None,
    hot_partition_factor: float = HOT_PARTITION_FACTOR,
    skew_stats: dict | None = None,
    decision_out: dict | None = None,
) -> DataFrame:
    """Skew-aware groupBy that PICKS its physical strategy from the
    data: probe the key histogram (or consume a caller-supplied
    ``skew_stats`` report, e.g. a cached diagnostics run), then build
    either the plain one-shuffle groupBy or the two-stage salted plan
    (:func:`salted_aggregate`) — identical results either way, only the
    plan differs.  The same auto-selection shape as
    ``functions.ranks.with_pct_rank``: measure, then commit to the
    plan that survives the observed distribution.

    ``combine_free`` declares that the payload aggregates do NOT
    benefit from map-side partial aggregation — pandas grouped-agg
    UDAFs and other Python paths, where every row of a key crosses the
    shuffle to one task.  JVM sum/count/min/max payloads should leave
    it False: measurement shows partial aggregation already neutralizes
    key skew for them and salting is pure overhead (the probe is then
    skipped entirely — no action, no cost).

    The salted plan spreads ONLY the hot keys (r9 hostile-corpus
    measurement): salting every key multiplies the per-group Python
    overhead — the very thing that makes a payload combine-free — by
    ``n_salts``, which on a 15k-key zipf corpus made the fully-salted
    plan 5.5x SLOWER than plain even with one key at 9x the even
    load.  Here the bounded hot set (:func:`hot_keys`, ≤
    partitions/factor rows at any scale) broadcasts back onto the
    input; hot rows salt across ``n_salts`` sub-keys, cold rows keep
    salt 0, so stage-1 group count stays ~|keys| while the hot key's
    single funneled task splits ``n_salts`` ways.  Cost vs plain: one
    broadcast + one extra combine shuffle of ~|keys| partial rows.

    ``decision_out``, when given, receives {salted, stats,
    shuffle_partitions, combine_free} so callers/tests can audit the
    choice."""
    spark = df.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    if not combine_free:
        skew_stats = skew_stats or {"total": -1, "n_keys": -1, "max_n": -1}
        salted = False
    else:
        if skew_stats is None:
            skew_stats = probe_key_skew(df, keys)
        salted = choose_agg_strategy(
            skew_stats,
            parts,
            combine_free=True,
            hot_partition_factor=hot_partition_factor,
        )
    if decision_out is not None:
        decision_out.update(
            salted=salted,
            stats=dict(skew_stats),
            shuffle_partitions=parts,
            combine_free=combine_free,
        )
    if salted:
        cut = int(
            hot_partition_factor * skew_stats["total"] / max(parts, 1)
        )
        hot = F.broadcast(
            hot_keys(df, keys, min_count=cut).withColumn(
                "__is_hot", F.lit(True)
            )
        )
        if salt_source is not None:
            salt_val = (
                F.xxhash64(F.col(salt_source)) % n_salts + n_salts
            ) % n_salts
        else:
            salt_val = F.spark_partition_id() % n_salts
        partial = (
            df.join(hot, keys, "left")
            .withColumn(
                "__salt",
                F.when(F.col("__is_hot"), salt_val).otherwise(F.lit(0)),
            )
            .groupBy(*keys, "__salt")
            .agg(*[a.partial for a in aggs])
        )
        return partial.groupBy(*keys).agg(*[a.combine() for a in aggs])
    return df.groupBy(*keys).agg(*[a.partial for a in aggs])


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


#: Salt a non-broadcast join when the hottest FACT key exceeds this
#: multiple of the even per-partition load AND AQE's skew-join split
#: is unavailable.  Measured (tools/soak_adaptive_join.py, 10M-row
#: fact x 5M-key dim, broadcast disabled, local[32]): with AQE
#: skew-split ON, plain SMJ beat the salted join at EVERY hot share
#: swept (1.2-2.4s vs 2.8-4.0s at x_even 0-16) — the n_salts-fold dim
#: replication costs more than the runtime partition split saves.
#: Salting a join therefore only pays where AQE cannot split (AQE off,
#: or join shapes/streams AQE does not cover), and there the
#: aggregation-path crossover (x_even ~6) is the operative guard.
JOIN_HOT_FACTOR = 6.0


def estimate_df_bytes(df: DataFrame, *, n_rows: int | None = None,
                      sample_rows: int = 1024) -> int:
    """Bounded-cost size estimate: row count (caller-supplied or one
    count action) x average serialized row width from a driver-side
    sample of ``sample_rows`` rows (JSON length as the width proxy —
    biased high vs tungsten rows, which is the safe direction for a
    broadcast decision)."""
    if n_rows is None:
        n_rows = df.count()
    if n_rows == 0:
        return 0
    sample = df.select(
        F.length(F.to_json(F.struct(*df.columns))).alias("w")
    ).limit(sample_rows)
    avg_w = sample.agg(F.avg("w")).first()[0] or 0.0
    return int(n_rows * avg_w)


def adaptive_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
    salt_source: str | None = None,
    dim_rows: int | None = None,
    hot_partition_factor: float = JOIN_HOT_FACTOR,
    skew_stats: dict | None = None,
    decision_out: dict | None = None,
) -> DataFrame:
    """Equi-join that PICKS its physical strategy from bounded probes,
    completing the diagnostics->decision story adaptive_aggregate
    starts for aggregation:

    1. **broadcast** when the dim's estimated bytes fit under the
       session's autoBroadcastJoinThreshold (estimate =
       :func:`estimate_df_bytes`: one count + a 1024-row width sample);
    2. else **plain** shuffle join whenever AQE's skew-join split is
       active — measured (tools/soak_adaptive_join.py): plain + AQE
       beat the salted plan at every hot share, because the
       n_salts-fold dim replication costs more than the runtime
       partition split saves;
    3. else (AQE skew-split unavailable) **salted**
       (:func:`salted_broadcastless_join`) when the fact's hottest key
       exceeds ``hot_partition_factor`` x the even per-partition load
       (probe = :func:`probe_key_skew`, three longs to the driver),
       plain otherwise.

    Results are identical on every branch; only the plan differs.
    ``decision_out`` receives {strategy, dim_bytes, broadcast_threshold,
    aqe_skew, stats, shuffle_partitions} for audit."""
    spark = fact.sparkSession
    thresh = int(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "0"))
    dim_bytes = estimate_df_bytes(dim, n_rows=dim_rows)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    aqe_skew = (
        spark.conf.get("spark.sql.adaptive.enabled", "false").lower()
        == "true"
        and spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled", "false"
        ).lower()
        == "true"
    )
    stats: dict = {}
    if thresh > 0 and dim_bytes <= thresh:
        strategy = "broadcast"
        out = fact.join(F.broadcast(dim), key)
    elif aqe_skew:
        strategy = "plain"
        out = fact.join(dim, key)
    else:
        stats = skew_stats or probe_key_skew(fact, [key])
        if choose_agg_strategy(
            stats,
            parts,
            combine_free=True,  # a join reducer has no map-side combine
            hot_partition_factor=hot_partition_factor,
        ):
            strategy = "salted"
            out = salted_broadcastless_join(
                fact, dim, key, n_salts=n_salts, salt_source=salt_source
            )
        else:
            strategy = "plain"
            out = fact.join(dim, key)
    if decision_out is not None:
        decision_out.update(
            strategy=strategy,
            dim_bytes=dim_bytes,
            broadcast_threshold=thresh,
            aqe_skew=aqe_skew,
            stats=dict(stats),
            shuffle_partitions=parts,
        )
    return out


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
