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
) -> DataFrame:
    """Build the sketch: (row j, bucket, counter) — d·w cells max."""
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
        ).alias("c")
    )
    return (
        rows.select("c.j", "c.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("counter"))
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
