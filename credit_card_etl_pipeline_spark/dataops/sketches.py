"""Count-min sketch (engine extension): sublinear frequency estimates.

The classic streaming/OLAP sketch — ``d`` universal hash rows over
``w`` counters; the estimate for a key is the MINIMUM of its ``d``
counters (always an overestimate, error ≤ N·e/w with probability
1−e^−d).  Spark-first shape: building the sketch is ONE map-side
explode (d rows per input) plus ONE groupBy over (row, bucket) — the
sketch itself is a d×w relation (KBs), broadcastable for probing.

Determinism: the hash family is the same fixed-coefficient universal
family as the minhash signatures (functions.hashing.MINHASH_COEFFS over
md5-int60 residues), so sketch counters — not just estimates — are
bit-identical across engines and re-checkable in a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE_P, MINHASH_COEFFS, md5_int60

#: Default geometry: 4 hash rows × 256 counters = 1024 cells.
CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(key: Column, j: int, width: int = CMS_WIDTH) -> Column:
    """Counter index of ``key`` in hash row ``j``."""
    a, b = MINHASH_COEFFS[j]
    x = md5_int60(key.cast("string")) % MERSENNE_P
    return ((F.lit(a) * x + F.lit(b)) % MERSENNE_P) % width


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row j, bucket, counter) — d·w cells max.

    ``weight_col`` builds the identical sketch from PRE-AGGREGATED
    (key, count) rows — ``counter = Σ weight`` per cell instead of a
    raw-row count.  A caller that already holds exact per-key counts
    (e.g. for a truth audit) hashes each KEY once instead of md5-ing
    every stream row ``depth`` times, and the build input shrinks from
    the stream to the key set.  Weights are expected non-null (a
    per-key count can't be NULL); a NULL weight is coalesced to 0 —
    i.e. "key seen, zero rows" — so the weighted build never emits a
    NULL counter where the raw-row build would emit a number."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
        *(
            [F.coalesce(F.col(weight_col), F.lit(0)).alias("__w")]
            if weight_col
            else []
        ),
    )
    counter = (
        F.sum("__w") if weight_col else F.count(F.lit(1))
    ).cast("long").alias("counter")
    return (
        rows.select("c.j", "c.bucket", *(["__w"] if weight_col else []))
        .groupBy("j", "bucket")
        .agg(counter)
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch: min over the d counters per probe key.
    The sketch is broadcast — probing is map-side."""
    lookups = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.j", "c.bucket")
    return (
        lookups.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(key_col)
        .agg(F.min("counter").cast("long").alias("cms_estimate"))
    )


# --------------------------------------------------------------------
# Deterministic HyperLogLog (cross-engine verifiable registers)
# --------------------------------------------------------------------
# SURVEY §7 flags approx distinct counting as the opt-in scale variant
# of the reference's exact nunique.  Spark's approx_count_distinct is a
# black box to an oracle; this HLL builds its registers from the same
# md5 hash both engines share, so the SKETCH ITSELF is value-checked —
# bucket = low 6 bits of the 60-bit hash, rank = position of the
# lowest set bit of the remaining 54 (max 55), register = max rank.

HLL_M = 64  # registers (2^6 buckets)
_HLL_SCALE = 56  # 2^(56 - rho) stays exact in int64 for rho in [0, 55]


def hll_rho(rest: Column) -> Column:
    """1-based position of the lowest set bit (0 input → 55, the
    'all-zero remainder' sentinel).  log2 of a power of two is exact in
    IEEE doubles, so the cast is safe on any engine."""
    lsb = rest.bitwiseAND(-rest)
    return (
        F.when(rest == 0, F.lit(55))
        .otherwise(F.log2(lsb).cast("int") + 1)
        .cast("int")
    )


def hll_registers(
    df: DataFrame, col: str, *, m: int = HLL_M
) -> DataFrame:
    """(bucket, max_rho) registers of the deterministic HLL over the
    DISTINCT hash stream of ``col`` — one narrow groupBy, m rows out;
    mergeable across partitions/streams by max, like any HLL."""
    h = md5_int60(F.col(col).cast("string"))
    # integer div, NOT / : the 60-bit hash exceeds double precision
    prepped = df.select(h.alias("h")).select(
        F.expr(f"CAST(h % {m} AS INT)").alias("bucket"),
        F.expr(f"h div {m}").alias("rest"),
    )
    rho = hll_rho(F.col("rest"))
    return (
        prepped.select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_registers_by(
    df: DataFrame, col: str, seg_col: str, *, m: int = HLL_M
) -> DataFrame:
    """Per-segment HLL registers: (segment, bucket, max_rho) — the
    mergeable form.  Each segment's sketch is m tiny rows; sketches
    union across segments/partitions/days by ``max`` over bucket (see
    :func:`hll_merge`), which is how a 100 TB corpus gets a distinct
    count per day AND overall from ONE pass: keep the per-day
    registers, merge downstream."""
    h = md5_int60(F.col(col).cast("string"))
    prepped = df.select(F.col(seg_col).alias("seg"), h.alias("h")).select(
        "seg",
        F.expr(f"CAST(h % {m} AS INT)").alias("bucket"),
        F.expr(f"h div {m}").alias("rest"),
    )
    rho = hll_rho(F.col("rest"))
    return (
        prepped.select("seg", "bucket", rho.alias("rho"))
        .groupBy("seg", "bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_merge(registers_by: DataFrame) -> DataFrame:
    """Union per-segment sketches into one: max per bucket — the HLL
    merge operation (lossless: merged registers equal the registers of
    the concatenated streams)."""
    return registers_by.groupBy("bucket").agg(
        F.max("max_rho").cast("int").alias("max_rho")
    )


def hll_estimate(registers: DataFrame, *, m: int = HLL_M) -> DataFrame:
    """Raw HLL estimate from the registers: alpha_m * m^2 / Z, with
    Z = sum(2^-M_j) over ALL m registers (absent buckets count 2^0).
    The harmonic sum rides EXACT integers (2^(56 - rho) per register,
    common denominator 2^56), so the one double division at the end is
    bit-identical on any engine given identical registers."""
    # coalesce: sum over ZERO register rows is NULL, but an empty
    # register set means every bucket is absent -> Z = m * 2^0 exactly
    s_present = F.coalesce(
        F.sum(F.expr(f"shiftleft(1L, {_HLL_SCALE} - max_rho)")), F.lit(0)
    )
    n_present = F.count(F.lit(1))
    return registers.agg(
        (
            s_present
            + (F.lit(m) - n_present) * F.lit(1 << _HLL_SCALE)
        ).cast("long").alias("s_scaled"),
        n_present.cast("long").alias("n_buckets_hit"),
    ).select(
        "n_buckets_hit",
        "s_scaled",
        (
            F.lit(0.7213 / (1 + 1.079 / m))
            * m * m * float(1 << _HLL_SCALE)
            / F.col("s_scaled")
        ).alias("hll_estimate"),
    )


# --------------------------------------------------------------------
# Deterministic Bloom filter (cross-engine verifiable bit set)
# --------------------------------------------------------------------
# The membership sketch: k positions per key over an m-bit space; a
# probe is CLAIMED present iff all k of its positions are set — no
# false negatives, bounded false positives (~(1-e^(-kn/m))^k).  The
# relational representation is the SET of set positions (≤ m rows,
# KBs) — broadcastable for map-side probing and mergeable across
# partitions/streams by plain union-distinct.  Positions come from the
# same fixed universal-hash family as minhash/count-min, so the filter
# CONTENTS are bit-identical in a DuckDB oracle.

BLOOM_M = 1024  # bit positions
BLOOM_K = 4     # hash functions


def bloom_position(key: Column, j: int, m: int = BLOOM_M) -> Column:
    """Bit position of ``key`` under hash ``j``."""
    a, b = MINHASH_COEFFS[j]
    x = md5_int60(key.cast("string")) % MERSENNE_P
    return ((F.lit(a) * x + F.lit(b)) % MERSENNE_P) % m


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Build the filter: the DISTINCT set positions — one map-side
    explode (k rows per key) + one dedup bounded by m.  NULL keys are
    dropped: NULL has no md5, so it would emit NULL positions that
    crash the bitmask assembly (null-hostile corpus, r10) — and a
    membership filter has no meaningful entry for "no content"."""
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        bloom_position(F.col(key_col), j, m)
                        for j in range(depth)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    depth: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """``probes`` + ``bloom_member`` (true iff every one of the key's
    ``depth`` positions is set).  The filter broadcasts, the position
    join is map-side, and the only shuffle is the per-key hit count."""
    lookups = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    bloom_position(F.col(key_col), j, m)
                    for j in range(depth)
                ]
            )
        ).alias("pos"),
    )
    hits = (
        lookups.join(F.broadcast(bloom), "pos")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    return (
        probes.join(hits, key_col, "left")
        .withColumn(
            "bloom_member",
            F.coalesce(F.col("__hits"), F.lit(0)) == depth,
        )
        .drop("__hits")
    )


def bloom_prefilter(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str,
    *,
    depth: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Map-side Bloom membership filter: ``depth`` broadcast LEFT SEMI
    joins, one per hash position — the fact never shuffles and never
    aggregates (``bloom_probe``'s per-key groupBy is for verdict
    AUDITING; this is the pushdown path).  Rows whose key might be in
    the member set survive; false positives are expected and removed
    by whatever exact join follows.  This is the manual form of
    Spark's runtime row-level filtering: at 100 TB it turns a
    join-everything shuffle into a shuffle of the ~matching fraction
    for the cost of broadcasting <= m positions.

    SIZE ``m`` TO THE MEMBER COUNT (~16-32 bits per key): a saturated
    filter passes everything and the pushdown silently degrades to a
    no-op — observed in the 30x soak with the 1024-bit default against
    a 4.6k-key dim (BENCH_HISTORY r5c)."""
    out = df
    for j in range(depth):
        out = out.join(
            F.broadcast(bloom),
            bloom_position(F.col(key_col), j, m) == bloom["pos"],
            "left_semi",
        )
    return out
