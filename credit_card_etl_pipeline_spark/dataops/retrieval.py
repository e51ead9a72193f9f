"""Ranked retrieval over the document corpus — integer-exact BM25.

A training-data pipeline queries its own corpus constantly (find the
docs about X to oversample / inspect / decontaminate against), so
ranked retrieval is a first-class operator, not a notebook one-off.

Scale shape (the part that matters at 100 TB):

* ONE tokenize+explode pass over the corpus feeds a single
  ``groupBy(doc_id)`` that computes document length AND the per-term
  term frequencies as conditional aggregates — the query's terms are a
  small literal list, so tf extraction is map-side projection work, not
  a second scan or a join against an exploded token table.
* Corpus statistics (N, total length, per-term document frequencies)
  come out of the same per-doc table as a 1-row aggregate, crossJoined
  back (BroadcastNestedLoopJoin of one row — the allowlisted scalar
  shape, no driver collect, no second job).
* Scoring unpivots only the matching (doc, term) rows (``tf > 0``), so
  the ranked set is bounded by matches, not corpus size; the final
  top-k is a TakeOrdered, not a global sort.

Scoring is the BM25 saturation formula with a rational IDF
(``N * 1e6 div df`` — the same integer-exact idf as
``text_tfidf_top_terms``) instead of the float logarithm: ranking
behavior is BM25's (rare terms dominate, tf saturates at k1, long docs
are damped by b), while every intermediate stays in truncating int64
arithmetic that DuckDB reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import words

#: BM25 constants, pre-scaled by 1000 (k1 = 1.2, b = 0.75).
K1_X1000 = 1200
B_X1000 = 750


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query, scored by
    integer-exact BM25 (see module docstring).

    Returns ``(doc_id, n_terms, dl, score_x1e9)`` — ``n_terms`` is how
    many distinct query terms the doc matched, ``dl`` its token length,
    ``score_x1e9`` the summed idf_ppm × tfsat_x1000 contributions.
    Ties break on ``doc_id`` so the limit is deterministic.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("term"),
    )
    tf_cols = [
        F.sum(F.when(F.col("term") == t, 1).otherwise(0))
        .cast("long")
        .alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    perdoc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl"), *tf_cols
    )
    df_cols = [
        F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
        .cast("long")
        .alias(f"df_{i}")
        for i in range(len(terms))
    ]
    scal = perdoc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sumdl"),
        *df_cols,
    )
    stack_args = ", ".join(
        f"'{t}', tf_{i}" for i, t in enumerate(terms)
    )
    matched = (
        perdoc.select(
            "doc_id",
            "dl",
            F.expr(
                f"stack({len(terms)}, {stack_args}) AS (term, tf)"
            ),
        )
        .where(F.col("tf") > 0)
        .crossJoin(F.broadcast(scal))
    )
    term_df = F.lit(None).cast("long")
    for i, t in enumerate(terms):
        term_df = F.when(F.col("term") == t, F.col(f"df_{i}")).otherwise(
            term_df
        )
    scored = matched.select(
        "doc_id",
        "dl",
        "tf",
        term_df.alias("df"),
        F.expr("sumdl * 1000L div n").alias("avgdl_x1000"),
        F.col("n"),
    ).select(
        "doc_id",
        "dl",
        "tf",
        F.expr("n * 1000000L div df").alias("idf_ppm"),
        F.expr(
            f"{1000 - B_X1000}L + ({B_X1000}L * dl * 1000L) div avgdl_x1000"
        ).alias("norm_x1000"),
    )
    contrib = scored.select(
        "doc_id",
        "dl",
        F.expr(
            f"idf_ppm * ((tf * {K1_X1000 + 1000}L * 1000L) div "
            f"(tf * 1000L + ({K1_X1000}L * norm_x1000) div 1000L))"
        ).alias("contrib"),
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.max("dl").alias("dl"),
            F.sum("contrib").cast("long").alias("score_x1e9"),
        )
        .orderBy(F.desc("score_x1e9"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_oracle_sql(terms: list[str], *, k: int = 10) -> str:
    """DuckDB twin of :func:`bm25_topk` over the ``documents`` view,
    generated from the SAME term list so engine and oracle cannot
    drift.  Every arithmetic step mirrors the Spark expressions
    (truncating int64 division both sides)."""
    norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    tf_exprs = ",\n           ".join(
        f"CAST(sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_exprs = ",\n           ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{i}"
        for i in range(len(terms))
    )
    unpivot = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, dl, '{t}' AS term, tf_{i} AS tf"
        f" FROM perdoc WHERE tf_{i} > 0"
        for i, t in enumerate(terms)
    )
    df_case = " ".join(
        f"WHEN '{t}' THEN df_{i}" for i, t in enumerate(terms)
    )
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({norm}, ' ')) AS term
    FROM documents
),
perdoc AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS dl,
           {tf_exprs}
    FROM toks GROUP BY doc_id
),
scal AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(dl) AS BIGINT) AS sumdl,
           {df_exprs}
    FROM perdoc
),
unp AS (
{unpivot}
),
matched AS (SELECT u.*, s.* FROM unp u CROSS JOIN scal s),
staged AS (
    SELECT doc_id, dl, tf,
           n * 1000000 // (CASE term {df_case} END) AS idf_ppm,
           {1000 - B_X1000} + ({B_X1000} * dl * 1000)
               // (sumdl * 1000 // n) AS norm_x1000
    FROM matched
),
contrib AS (
    SELECT doc_id, dl,
           idf_ppm * ((tf * {K1_X1000 + 1000} * 1000) //
               (tf * 1000 + ({K1_X1000} * norm_x1000) // 1000)) AS contrib
    FROM staged
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(max(dl) AS BIGINT) AS dl,
       CAST(sum(contrib) AS BIGINT) AS score_x1e9
FROM contrib
GROUP BY doc_id
ORDER BY score_x1e9 DESC, doc_id
LIMIT {k}
"""
