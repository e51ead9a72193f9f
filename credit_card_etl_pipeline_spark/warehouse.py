"""Warehouse layer (operators H13, B5, A10, A12) — the reference's
`load_to_db.py` re-expressed for a Parquet/table warehouse.

The reference writes a SQLite table with four B-tree indexes
(load_to_db.py:119-128); the Spark-native analogue is a partitioned
Parquet table — partition pruning on the billing month plus parquet
min/max stats replace the indexes (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import schema as S

#: H13 hash fields, in concat order (load_to_db.py:35-41).
_KEY_FIELDS = [
    S.TRANSACTION_DATE,
    S.MERCHANT,
    S.CARD_NO,
    S.PAYMENT_AMOUNT,
    S.TRANSACTION_TYPE,
]


def _key_part(col: str) -> Column:
    """One hash-input field: canonical string form, null → ''.

    Canonicalization (engine-defined, stable across engines): dates as
    ISO ``yyyy-MM-dd``, doubles via plain string cast (shortest
    round-trip, e.g. ``123.0``/``123.45`` — matching the reference's
    pandas ``str(float)`` rendering, load_to_db.py:32-33), strings
    trimmed.
    """
    c = F.col(col)
    if col in (S.TRANSACTION_DATE,):
        return F.coalesce(F.date_format(c, "yyyy-MM-dd"), F.lit(""))
    if col in (S.PAYMENT_AMOUNT,):
        return F.coalesce(c.cast("string"), F.lit(""))
    return F.coalesce(F.trim(c.cast("string")), F.lit(""))


def transaction_id() -> Column:
    """H13 (load_to_db.py:26-43): md5 over the concatenated key fields."""
    return F.md5(F.concat(*[_key_part(c) for c in _KEY_FIELDS]))


def to_warehouse(df: DataFrame) -> DataFrame:
    """B5 + H13: snake_case projection (load_to_db.py:81-104) plus the
    surrogate key.  Input is the refined 15-column surface."""
    cols = [
        F.col(src).alias(dst)
        for src, dst in S.WAREHOUSE_RENAME.items()
        if src in df.columns
    ]
    return df.select(*cols, transaction_id().alias("transaction_id"))


def write_warehouse(
    df: DataFrame,
    path: str,
    *,
    partition_by: str = "year_month",
    expected_rows: int | None = None,
    incremental: bool = False,
    n_partitions: int | None = None,
) -> int:
    """A10 + A12: overwrite (load_to_db.py:119) of a Parquet table
    partitioned by billing month, then a count-back validation
    (load_to_db.py:133-135).

    ``incremental=True`` switches to DYNAMIC partition overwrite: only
    the billing months present in ``df`` are replaced, untouched months
    stay on disk — the monthly-statement load path at scale (a new
    statement must not rewrite the whole history).  The default
    full-refresh matches the reference's ``if_exists='replace'``.

    Returns the post-write row count; with ``expected_rows`` set the
    check compares against it (full refresh: the input count;
    incremental: the expected post-merge total).
    """
    out = df.withColumn(
        partition_by,
        F.coalesce(
            F.date_format(F.col("transaction_date"), "yyyy-MM"), F.lit("unknown")
        ),
    )
    # Cluster rows by the partition value before writing: without this,
    # EVERY task writes a file into EVERY month directory (tasks ×
    # months small files — the classic small-files explosion).  A hash
    # repartition on the partition column gives one task (→ one file)
    # per month; AQE splits a genuinely skewed month at runtime.
    # Callers that know the month count pass ``n_partitions`` so the
    # layout is one write task per directory — with the default
    # shuffle-partition count each task receives several partition
    # values and the dynamic-partition writer's per-task value
    # switching measured ~3x slower (r11, same finding as the
    # hypertable refresh).
    if n_partitions is not None:
        out = out.repartition(max(int(n_partitions), 1), F.col(partition_by))
    else:
        out = out.repartition(F.col(partition_by))
    writer = out.write.mode("overwrite").partitionBy(partition_by)
    if incremental:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)
    count = df.sparkSession.read.parquet(path).count()
    if expected_rows is not None and count != expected_rows:
        raise ValueError(
            f"post-load validation failed: wrote {expected_rows} rows, "
            f"table has {count}"
        )
    return count


def ivm_merge(
    view0: DataFrame,
    deltas: DataFrame,
    keys: list[str],
    count_col: str,
    sum_cols: dict[str, str],
) -> DataFrame:
    """Counts-and-sums incremental view maintenance: bring the standing
    materialized aggregate ``view0`` (``keys`` + ``count_col`` + the
    ``sum_cols`` values) up to date from a pre-aggregated delta feed
    (``keys`` + ``count_col`` + ``sum_cols`` keys, one row per changed
    group) WITHOUT touching the base table.  Handles the full group
    lifecycle:

    * update  — existing group, deltas add onto the standing row;
    * death   — a group whose maintained count drops to 0 leaves the
      view (a from-scratch GROUP BY would never emit it);
    * birth   — a key present only in the delta feed enters the view
      as a fresh row (a left-join-only merge would silently drop it).

    Scale shape: the view is NEVER shuffled.  The delta feed is one
    changed-groups aggregate (small by the IVM premise), so it rides a
    broadcast left join onto the view; births are found by
    broadcast-semi-ing the view's MATCHED keys (bounded by the delta
    size, so the anti-join build side stays tiny even when the view
    has billions of groups).  Refresh cost ~ churn, not table size.

    ``sum_cols`` maps each delta column name -> the view column it
    maintains, e.g. ``{"damt": "revenue_cents"}``; ``count_col`` names
    the view's count column, maintained by the delta column of the
    same name prefixed with ``d`` (``dn`` for ``n_orders`` is passed
    explicitly as a sum_cols-style pair below for clarity).
    """
    dcount = [c for c in deltas.columns if c not in keys and c not in sum_cols]
    if len(dcount) != 1:
        raise ValueError(
            f"delta feed must carry exactly one count column besides "
            f"{keys} and {sorted(sum_cols)}; got {sorted(deltas.columns)}"
        )
    dcount = dcount[0]
    # a delta column named like a view column (e.g. a delta count also
    # called 'n_orders') makes F.col(...) ambiguous after the join and
    # dies at analysis time with an opaque error — reject it up front
    clash = sorted(
        (set(deltas.columns) - set(keys)) & set(view0.columns)
    )
    if clash:
        raise ValueError(
            f"ivm_merge: delta column(s) {clash} collide with view "
            f"columns; rename the delta feed's non-key columns"
        )

    merged = view0.join(F.broadcast(deltas), keys, "left").select(
        *keys,
        (F.col(count_col) + F.coalesce(dcount, F.lit(0)))
        .cast("long")
        .alias(count_col),
        *[
            (F.col(vcol) + F.coalesce(dc, F.lit(0)))
            .cast("long")
            .alias(vcol)
            for dc, vcol in sum_cols.items()
        ],
    )
    # births: delta keys with no standing row.  The view's matched key
    # set is <= |deltas| rows (broadcast semi keeps the view map-side),
    # so IT can broadcast as the anti-join build side.
    matched = view0.select(*keys).join(
        F.broadcast(deltas.select(*keys).distinct()), keys, "left_semi"
    )
    births = deltas.join(F.broadcast(matched), keys, "left_anti").select(
        *keys,
        F.col(dcount).cast("long").alias(count_col),
        *[
            F.col(dc).cast("long").alias(vcol)
            for dc, vcol in sum_cols.items()
        ],
    )
    return merged.unionByName(births).where(F.col(count_col) > 0)
