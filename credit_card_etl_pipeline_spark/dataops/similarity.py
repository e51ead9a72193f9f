"""Embedding similarity search (engine extension).

* :func:`cosine_topk` — exact brute-force top-k: the correctness
  baseline.  Query set is broadcast; candidates stream through one
  narrow pass; per-query top-k via window rank over (query, candidate)
  scores.  At 100 TB this is O(|queries|·|corpus|) — use for small
  query batches or as the oracle for the approximate path.
* :func:`ann_lsh_topk` — random-hyperplane LSH buckets: sign-bit
  sketches computed in one pass, candidates restricted to same-bucket
  collisions, then exact re-scoring within buckets.  The scale path:
  shuffle moves (bucket, vec) once; no all-pairs product.

Determinism: scores are computed on integer-quantized vectors
(``round(x*1000)``) so dot products are exact integer sums — the
DuckDB oracle reproduces them bit-for-bit; cosine is a single double
division at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Fixed quantization scale for cross-engine-exact arithmetic.
QUANT_SCALE = 1000


def quantize(vec: Column) -> Column:
    """float array → integer array (round(x * QUANT_SCALE))."""
    return F.transform(
        vec, lambda x: F.round(x * QUANT_SCALE).cast("long")
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    ``df``/``queries`` must carry ``id_col`` and a quantized ``vec_col``
    (see :func:`quantize`).  Self-matches are excluded; ties broken by
    candidate id for determinism.
    """
    cand = df.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        _norm2(F.col(vec_col)).alias("cnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm2(F.col(vec_col)).alias("qnorm"),
    )
    scored = cand.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
    scored = scored.select(
        "query_id",
        "cand_id",
        (
            _dot(F.col("qv"), F.col("cvec"))
            / F.sqrt(F.col("qnorm").cast("double") * F.col("cnorm").cast("double"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("long"))
    )


# ------------------------------------------------------------------
# LSH-bucketed approximate variant
# ------------------------------------------------------------------

def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic integer "random" hyperplanes: coefficients in
    [-3, 3] from a fixed congruence — identical literals in the SQL
    oracle."""
    return [
        [((i * (j + 1) + (j + 1) * (j + 1)) % 7) - 3 for i in range(dim)]
        for j in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Sign-bit sketch: bucket = Σ_j 2^j · [plane_j · v > 0]."""
    bucket: Column | None = None
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(c) for c in plane])
        bit = F.when(_dot(vec, lit_plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    assert bucket is not None
    return bucket.cast("long")


def ann_lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact re-scoring restricted to candidates in
    the query's LSH bucket.  Recall < 1 by design; the exact
    :func:`cosine_topk` is the quality oracle."""
    planes = hyperplanes(n_planes, dim)
    cand = df.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        _norm2(F.col(vec_col)).alias("cnorm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm2(F.col(vec_col)).alias("qnorm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = cand.join(
        F.broadcast(q), on="bucket"
    ).where(F.col("cand_id") != F.col("query_id"))
    scored = scored.select(
        "query_id",
        "cand_id",
        (
            _dot(F.col("qv"), F.col("cvec"))
            / F.sqrt(F.col("qnorm").cast("double") * F.col("cnorm").cast("double"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("long"))
    )
