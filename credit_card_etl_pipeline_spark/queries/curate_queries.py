"""Curation query family (engine extension): PII scrubbing, repetition
signals, benchmark decontamination, and context-window chunking over
the ``documents`` corpus — each with a DuckDB oracle computing
bit-identical values (RE2-compatible regexes shared verbatim, integer
counts, doubles only as a final division of identical integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dataops import curate as cu
from ..dataops import dedup as dd
from ..functions.hashing import md5_int60_sql
from . import load, query

#: Normalized text (twin of dataops.text.normalize_text).
_NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


# ------------------------------------------------------------------
# PII scrubbing
# ------------------------------------------------------------------

#: Deterministic PII injection per doc_id % 4 — the raw corpus has no
#: PII, which would make the scrubber vacuous.  Built identically on
#: both engines (string concat of integer-derived pieces).
def _pii_text_spark(doc_id: F.Column, text: F.Column) -> F.Column:
    d3 = F.lpad((doc_id % 1000).cast("string"), 3, "0")
    d4 = F.lpad((doc_id % 10000).cast("string"), 4, "0")
    oct_ = (doc_id % 256).cast("string")
    m = doc_id % 4
    return F.concat(
        text,
        F.when(
            m == 0,
            F.concat(F.lit(" contact user"), doc_id.cast("string"),
                     F.lit("@mail.example.com now")),
        )
        .when(m == 1, F.concat(F.lit(" call 555-"), d3, F.lit("-"), d4,
                               F.lit(" today")))
        .when(m == 2, F.concat(F.lit(" card 4111-1111-1111-"), d4,
                               F.lit(" on file")))
        .otherwise(F.concat(F.lit(" host 10."), oct_, F.lit(".0.1 up"))),
    )


_PII_TEXT_SQL = """
text || CASE doc_id % 4
    WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail.example.com now'
    WHEN 1 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' today'
    WHEN 2 THEN ' card 4111-1111-1111-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' on file'
    ELSE ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 up'
END
"""

_PII_COUNT_SQL = ",\n       ".join(
    f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{kind}s"
    for kind, pat, _ in cu.PII_PATTERNS
)

_PII_SCRUB_SQL = "t"
for _, _pat, _tok in cu.PII_PATTERNS:
    # Replacement templates are stored in Java `$n` group syntax;
    # DuckDB's RE2 rewrite wants `\n` (single backslash — DuckDB
    # regular string literals do not process escapes).
    _rewrite = _tok.replace("$", "\\")
    _PII_SCRUB_SQL = (
        f"regexp_replace({_PII_SCRUB_SQL}, '{_pat}', '{_rewrite}', 'g')"
    )

_PII_ORACLE = f"""
WITH pii AS (
    SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents
)
SELECT doc_id,
       {_PII_COUNT_SQL},
       md5({_PII_SCRUB_SQL}) AS scrubbed_md5
FROM pii
"""


@query("pii_scrub_documents", _PII_ORACLE)
def pii_scrub_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing as a map-only JVM regex pass: per-kind occurrence
    counts plus the md5 of the fully masked text, over documents with
    deterministically injected emails/phones/cards/IPs.  Patterns are
    the RE2-compatible subset, shared verbatim with the oracle."""
    docs = load(spark, sf_dir, "documents")
    t = _pii_text_spark(F.col("doc_id"), F.col("text"))
    counts = cu.pii_counts(t)
    return docs.select(
        "doc_id",
        *[counts[kind].alias(f"n_{kind}s") for kind, _, _ in cu.PII_PATTERNS],
        F.md5(cu.pii_scrub(t)).alias("scrubbed_md5"),
    )


# ------------------------------------------------------------------
# Repetition signals
# ------------------------------------------------------------------

_REPETITION_ORACLE = f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
words AS (
    SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM corpus
),
toks AS (SELECT doc_id, unnest(w) AS gram FROM words),
bigs AS (
    SELECT doc_id,
           unnest(list_transform(
               generate_series(1, greatest(len(w) - 1, 0)),
               i -> w[i] || ' ' || w[i+1])) AS gram
    FROM words
),
wstats AS (
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CAST(max(cnt) AS BIGINT) AS top_words_n
    FROM (SELECT doc_id, gram, count(*) AS cnt FROM toks GROUP BY 1, 2)
    GROUP BY doc_id
),
bstats AS (
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(max(cnt) AS BIGINT) AS top_bigrams_n
    FROM (SELECT doc_id, gram, count(*) AS cnt FROM bigs GROUP BY 1, 2)
    GROUP BY doc_id
)
SELECT w.doc_id, n_words, n_distinct_words, top_words_n,
       CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(n_distinct_bigrams, 0) AS BIGINT) AS n_distinct_bigrams,
       CAST(COALESCE(top_bigrams_n, 0) AS BIGINT) AS top_bigrams_n,
       (n_words - n_distinct_words) / CAST(n_words AS DOUBLE)
           AS dup_word_frac,
       top_words_n / CAST(n_words AS DOUBLE) AS top_word_frac,
       CASE WHEN COALESCE(n_bigrams, 0) > 0
            THEN (n_bigrams - n_distinct_bigrams) / CAST(n_bigrams AS DOUBLE)
            ELSE 0.0 END AS dup_bigram_frac
FROM wstats w LEFT JOIN bstats b USING (doc_id)
"""


@query("text_repetition_signals", _REPETITION_ORACLE)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition profile per document: word/bigram totals,
    distincts, top-gram counts, and duplicate fractions — exact integer
    counts from two map-side-combinable aggregations."""
    return cu.repetition_signals(load(spark, sf_dir, "documents"))


# ------------------------------------------------------------------
# Benchmark decontamination
# ------------------------------------------------------------------

def _shingle_cte(src: str, name: str) -> str:
    return f"""
{name}_words AS (
    SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM {src}
),
{name} AS (
    SELECT DISTINCT doc_id,
           unnest(list_slice(w, 1, greatest(len(w) - 2, 0))) || ' ' ||
           unnest(list_slice(w, 2, greatest(len(w) - 1, 0))) || ' ' ||
           unnest(list_slice(w, 3, len(w))) AS shingle
    FROM {name}_words
)"""


_DECONTAM_ORACLE = f"""
WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
{_shingle_cte('train', 'ts')},
{_shingle_cte('bench', 'bs')},
bset AS (SELECT DISTINCT shingle FROM bs),
shared AS (
    SELECT ts.doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM ts JOIN bset USING (shingle)
    GROUP BY ts.doc_id
),
totals AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
    FROM ts GROUP BY doc_id
)
SELECT t.doc_id, n_shingles,
       CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
       COALESCE(n_shared, 0) / CAST(n_shingles AS DOUBLE) AS overlap_frac
FROM totals t LEFT JOIN shared s USING (doc_id)
"""


@query("decontaminate_vs_benchmark", _DECONTAM_ORACLE)
def decontaminate_vs_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, the count and
    fraction of its distinct 3-gram shingles that occur anywhere in the
    held-out benchmark slice (doc_id % 50 == 0).  The benchmark shingle
    set is broadcast — the corpus is scanned exactly once."""
    docs = load(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 50 != 0)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    return cu.benchmark_overlap(train, bench)


# ------------------------------------------------------------------
# Context-window chunking
# ------------------------------------------------------------------

_CHUNK, _OVERLAP, _STRIDE = 32, 8, 24

# Token-explode formulation: the obvious slice-per-start oracle
# carries the doc's FULL token list into every start row (DuckDB
# physically copies captured/lateral lists per element), which is
# quadratic in document length — >15 min on the hostile corpus's
# 200k-token docs vs ~10 s for this form, which unnests (tok, pos)
# once and assigns each token to its 1-2 overlapping windows
# arithmetically.  Output is bit-identical (hash gate).
_CHUNK_ORACLE = f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
words AS (
    SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM corpus
),
tokpos AS (
    SELECT doc_id, len(w) AS L, unnest(w) AS tok,
           unnest(generate_series(1, len(w))) AS pos
    FROM words
),
m AS (
    SELECT doc_id, tok, pos,
           unnest(generate_series(
               greatest(0, (pos - {_CHUNK - _STRIDE + 1}) // {_STRIDE}),
               least((pos - 1) // {_STRIDE}, (L - 1) // {_STRIDE}))) AS k
    FROM tokpos
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_index,
       CAST(min(pos) AS BIGINT) AS chunk_start,
       CAST(count(*) AS BIGINT) AS n_chunk_tokens,
       string_agg(tok, ' ' ORDER BY pos) AS chunk_text
FROM m GROUP BY doc_id, k
"""


@query("chunk_context_windows", _CHUNK_ORACLE)
def chunk_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: {_CHUNK}-token windows advancing by
    {_STRIDE} (8-token overlap), as a pure map-only array expression —
    every chunk carries (doc_id, chunk_index, start, length, text)."""
    return cu.chunk_documents(
        load(spark, sf_dir, "documents"),
        chunk_tokens=_CHUNK,
        overlap=_OVERLAP,
    )


# ------------------------------------------------------------------
# Corpus-wide duplicate-chunk removal (C4 line-dedup analogue)
# ------------------------------------------------------------------

_DCHUNK = 32

_CHUNK_DEDUP_ORACLE = f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
w AS (
    SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
),
tokpos AS (
    SELECT doc_id, unnest(toks) AS tok,
           unnest(generate_series(1, len(toks))) AS pos
    FROM w
),
chunks AS (
    SELECT doc_id,
           CAST((pos - 1) // {_DCHUNK} AS BIGINT) AS chunk_index,
           CAST(min(pos) AS BIGINT) AS chunk_start,
           CAST(count(*) AS BIGINT) AS n_chunk_tokens,
           string_agg(tok, ' ' ORDER BY pos) AS chunk_text
    FROM tokpos
    GROUP BY doc_id, (pos - 1) // {_DCHUNK}
),
ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY md5(chunk_text)
                              ORDER BY doc_id, chunk_index) AS rk
    FROM chunks
)
SELECT doc_id, chunk_index, chunk_start, n_chunk_tokens, chunk_text
FROM ranked WHERE rk = 1
"""


@query("curate_chunk_dedup", _CHUNK_DEDUP_ORACLE)
def curate_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicate-span removal at chunk granularity (the
    corpus has no newlines, so fixed {_DCHUNK}-token chunks stand in
    for lines): every repeated chunk across the WHOLE corpus is
    dropped, keeping the globally-first copy by (doc_id, chunk_index).
    One exchange keyed on the chunk md5 — never on the text payload,
    never chunk-vs-chunk joins (see dataops.curate.dedup_corpus_chunks
    for the 100 TB design notes)."""
    return cu.dedup_corpus_chunks(
        load(spark, sf_dir, "documents"), chunk_tokens=_DCHUNK
    )


# ------------------------------------------------------------------
# LM-typicality quality score (perplexity-filter stand-in)
# ------------------------------------------------------------------

_LM_TYP_ORACLE = f"""
WITH w AS (
    SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id,
           unnest(list_slice(toks, 1, len(toks) - 1)) || ' ' ||
           unnest(list_slice(toks, 2, len(toks))) AS gram
    FROM (SELECT doc_id, toks FROM w WHERE len(toks) >= 2)
),
counts AS (
    SELECT gram, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY gram
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM counts),
scored AS (
    SELECT doc_id,
           CAST(floor(log2(t)) - floor(log2(c)) AS BIGINT) AS bits
    FROM grams JOIN counts USING (gram) CROSS JOIN tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(bits) AS BIGINT) AS surprisal_bits,
       CAST(sum(bits) * 1000 // count(*) AS BIGINT)
           AS avg_surprisal_milli
FROM scored GROUP BY doc_id
"""


@query("curate_lm_typicality", _LM_TYP_ORACLE)
def curate_lm_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality filter: per-document integer surprisal
    under a word-bigram model fit on the corpus itself (the KenLM
    filtering step of an LLM pipeline, float-free).  Score =
    ``Σ floor(log2 T) - floor(log2 c)`` over bigram occurrences —
    monotone in true -log2 likelihood, bit-identical across engines.
    Two shuffles at any scale (fit groupBy(gram), score groupBy(doc));
    the scalar T is a 1-row broadcast (see
    dataops.curate.lm_typicality)."""
    return cu.lm_typicality(load(spark, sf_dir, "documents"))


# ------------------------------------------------------------------
# DSIR importance resampling (target-conditioned data selection)
# ------------------------------------------------------------------

_DSIR_B = cu.DSIR_BUCKETS

_DSIR_ORACLE = f"""
WITH w AS (
    SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS toks
    FROM documents
),
grams AS (
    SELECT doc_id, (lang = 'en') AS is_target,
           CAST(('0x' || substr(md5(
                unnest(list_slice(toks, 1, len(toks) - 1)) || ' ' ||
                unnest(list_slice(toks, 2, len(toks)))), 1, 15))
                AS BIGINT) % {_DSIR_B} AS bucket
    FROM (SELECT doc_id, lang, toks FROM w WHERE len(toks) >= 2)
),
raw AS (
    SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM grams GROUP BY bucket
),
tgt AS (
    SELECT bucket, CAST(count(*) AS BIGINT) AS ct
    FROM grams WHERE is_target GROUP BY bucket
),
model AS (
    SELECT bucket, cr, CAST(COALESCE(ct, 0) AS BIGINT) AS ct
    FROM raw LEFT JOIN tgt USING (bucket)
),
tot AS (
    SELECT CAST(sum(cr) AS BIGINT) AS tr, CAST(sum(ct) AS BIGINT) AS tt
    FROM model
),
scored AS (
    SELECT doc_id,
           CAST((floor(log2(tr + {_DSIR_B})) - floor(log2(cr + 1)))
              - (floor(log2(tt + {_DSIR_B})) - floor(log2(ct + 1)))
                AS BIGINT) AS bits
    FROM grams JOIN model USING (bucket) CROSS JOIN tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(bits) AS BIGINT) AS dsir_bits,
       CAST(sum(bits) * 1000 // count(*) AS BIGINT) AS avg_bits_milli,
       (sum(bits) * 1000 // count(*)) > 0 AS keep
FROM scored GROUP BY doc_id
"""


@query("dsir_importance_weights", _DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (arXiv:2302.03169): hashed-bigram importance
    weights of every document against a target distribution (here the
    English slice stands in for the high-quality target corpus), in
    exact integer bit arithmetic.  Both fitted models are bounded at
    4096 buckets and broadcast; the only fact-sized shuffles are the
    model fit and the per-doc score — see dataops.curate.dsir_weights
    for the 100 TB argument."""
    docs = load(spark, sf_dir, "documents")
    return cu.dsir_weights(docs, F.col("lang") == "en")


# ------------------------------------------------------------------
# Corpus drift detection (two-snapshot TV distance)
# ------------------------------------------------------------------

_DRIFT_ORACLE = f"""
WITH sides AS (
    SELECT FALSE AS is_new, text FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT TRUE,
           CASE WHEN doc_id % 10 = 1
                THEN text || ' drift drift drift drift' ELSE text END
    FROM documents WHERE doc_id % 2 = 1
),
w AS (
    SELECT is_new, string_split({_NORM_SQL}, ' ') AS toks FROM sides
),
grams AS (
    SELECT is_new,
           CAST(('0x' || substr(md5(
                unnest(list_slice(toks, 1, len(toks) - 1)) || ' ' ||
                unnest(list_slice(toks, 2, len(toks)))), 1, 15))
                AS BIGINT) % {_DSIR_B} AS bucket
    FROM (SELECT is_new, toks FROM w WHERE len(toks) >= 2)
),
counts AS (
    SELECT bucket,
           CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS c_ref,
           CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS c_new
    FROM grams GROUP BY bucket
),
tot AS (
    SELECT CAST(sum(c_ref) AS BIGINT) AS tr,
           CAST(sum(c_new) AS BIGINT) AS tn
    FROM counts
),
shares AS (
    SELECT bucket, c_ref, c_new,
           CASE WHEN tr = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(c_ref * 1000000 // tr AS BIGINT)
           END AS share_ref_ppm,
           CASE WHEN tn = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(c_new * 1000000 // tn AS BIGINT)
           END AS share_new_ppm
    FROM counts CROSS JOIN tot
),
d AS (
    SELECT *, CAST(abs(share_new_ppm - share_ref_ppm) AS BIGINT)
                  AS delta_ppm
    FROM shares
),
tv AS (SELECT CAST(sum(delta_ppm) // 2 AS BIGINT) AS tv_ppm FROM d)
SELECT bucket, c_ref, c_new, share_ref_ppm, share_new_ppm, delta_ppm,
       tv_ppm
FROM d CROSS JOIN tv
"""


@query("corpus_drift_tv", _DRIFT_ORACLE)
def corpus_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitoring: hashed-bigram distributions of two
    snapshots (even docs = reference, odd docs = new, with a planted
    drift phrase in 10% of the new side so the statistic is
    non-vacuous) compared per bucket plus the global total-variation
    distance in exact ppm.  One tagged explode, one aggregation onto
    the bounded bucket domain, 1-row broadcasts for totals/TV — see
    dataops.curate.gram_distribution_drift."""
    docs = load(spark, sf_dir, "documents")
    ref = docs.where(F.col("doc_id") % 2 == 0).select("text")
    new = docs.where(F.col("doc_id") % 2 == 1).select(
        F.when(
            F.col("doc_id") % 10 == 1,
            F.concat(F.col("text"), F.lit(" drift drift drift drift")),
        )
        .otherwise(F.col("text"))
        .alias("text")
    )
    return cu.gram_distribution_drift(ref, new)


# ------------------------------------------------------------------
# Training-mix weighted sampling
# ------------------------------------------------------------------

#: en upsampled to 2.5 epochs, zh kept at 40%, everything else 1.0.
_MIX_WEIGHTS = {"en": 25000, "zh": 4000}

_MIX_ORACLE = f"""
WITH weighted AS (
    SELECT doc_id, lang, source,
           CASE lang WHEN 'en' THEN 25000 WHEN 'zh' THEN 4000
                ELSE 10000 END AS bp,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 10000 AS h
    FROM documents
),
copies AS (
    SELECT doc_id, lang, source,
           bp // 10000 + CASE WHEN h < bp % 10000 THEN 1 ELSE 0 END AS n
    FROM weighted
)
SELECT doc_id, lang, source,
       CAST(unnest(generate_series(1, CAST(n AS INTEGER))) AS BIGINT) AS epoch
FROM copies WHERE n >= 1
"""


@query("training_mix_sample", _MIX_ORACLE)
def training_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mixture sampling over documents: English
    upsampled to 2.5 epochs (every doc twice + a hash-chosen half a
    third time), Chinese downsampled to 0.4, other languages kept at
    1.0 — md5-stream determinism, map-only replication."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return cu.weighted_mix(docs, _MIX_WEIGHTS)


# ------------------------------------------------------------------
# Token-budget corpus allocation (largest-remainder quotas + greedy
# hash-ordered fill)
# ------------------------------------------------------------------

#: Total token budget for the selection demo.  Small enough that the
#: per-source quotas BITE at sf0.01 (sources get partial fills).
_BUDGET_TOKENS = 20_000

_BUDGET_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source,
           CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS n_tokens,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS h
    FROM documents
),
totals AS (
    SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t
    FROM toks GROUP BY source
),
grand AS (SELECT CAST(sum(t) AS BIGINT) AS tt FROM totals),
alloc AS (
    SELECT source, t,
           CAST({_BUDGET_TOKENS} * t // tt AS BIGINT) AS base,
           CAST({_BUDGET_TOKENS} * t % tt AS BIGINT) AS rem,
           CAST({_BUDGET_TOKENS} - sum({_BUDGET_TOKENS} * t // tt)
                    OVER () AS BIGINT) AS leftover
    FROM totals CROSS JOIN grand
),
quota AS (
    SELECT source, t,
           base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                            <= leftover
                       THEN 1 ELSE 0 END AS quota_tokens
    FROM alloc
),
filled AS (
    SELECT k.doc_id, k.source, k.n_tokens,
           CAST(sum(k.n_tokens) OVER (PARTITION BY k.source
                                      ORDER BY k.h, k.doc_id
                                      ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_tokens,
           q.quota_tokens
    FROM toks k JOIN quota q USING (source)
)
SELECT doc_id, source, n_tokens, cum_tokens,
       CAST(quota_tokens AS BIGINT) AS quota_tokens,
       (cum_tokens <= quota_tokens) AS selected
FROM filled
"""


@query("corpus_token_budget_fill", _BUDGET_ORACLE)
def corpus_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: a global budget is split across
    sources proportionally to their token mass with LARGEST-REMAINDER
    rounding (quotas sum to the budget EXACTLY — the cents-proration
    rule applied to tokens), then each source fills greedily in
    deterministic md5-hash order until its running token prefix-sum
    exceeds the quota.  This is the budget-based third leg of the
    sampling family (weighted_mix = epoch-based, stratified sample =
    count-based).  Shape: one source aggregation (+1-row grand total
    broadcast), the |sources|-row quota table broadcast back, and ONE
    per-source window for the prefix sum — two keyed shuffles at any
    scale.  Int64 bound: budget × source_tokens < 2^63 (switch the
    product to DECIMAL past ~1e6 budget × 1e12 tokens)."""
    docs = load(spark, sf_dir, "documents")
    from ..dataops.text import normalize_text
    from ..functions.hashing import md5_int60
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(normalize_text(F.col("text")), " "))
        .cast("long")
        .alias("n_tokens"),
        md5_int60(F.col("doc_id").cast("string")).alias("h"),
    )
    totals = toks.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("t")
    )
    grand = totals.agg(F.sum("t").cast("long").alias("tt"))
    alloc = totals.crossJoin(F.broadcast(grand)).select(
        "source",
        "t",
        F.expr(f"CAST({_BUDGET_TOKENS} * t div tt AS BIGINT)").alias("base"),
        F.expr(f"CAST({_BUDGET_TOKENS} * t % tt AS BIGINT)").alias("rem"),
    )
    wsum = Window.partitionBy()
    wrank = Window.partitionBy().orderBy(F.desc("rem"), F.asc("source"))
    quota = alloc.select(
        "source",
        (
            F.col("base")
            + F.when(
                F.row_number().over(wrank)
                <= _BUDGET_TOKENS - F.sum("base").over(wsum),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("quota_tokens"),
    )
    wfill = (
        Window.partitionBy("source")
        .orderBy(F.asc("h"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = toks.join(F.broadcast(quota), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        F.sum("n_tokens").over(wfill).cast("long").alias("cum_tokens"),
        "quota_tokens",
    )
    return filled.select(
        "doc_id",
        "source",
        "n_tokens",
        "cum_tokens",
        "quota_tokens",
        (F.col("cum_tokens") <= F.col("quota_tokens")).alias("selected"),
    )


# ------------------------------------------------------------------
# Sequence packing
# ------------------------------------------------------------------

_SEQ_TOKENS = 512

_PACK_ORACLE = f"""
WITH counted AS (
    SELECT doc_id,
           CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_tok
    FROM counted
)
SELECT doc_id, n_tokens, start_tok,
       CAST(start_tok // {_SEQ_TOKENS} AS BIGINT) AS first_seq,
       CAST((start_tok + n_tokens - 1) // {_SEQ_TOKENS} AS BIGINT) AS last_seq,
       CAST(start_tok % {_SEQ_TOKENS} AS BIGINT) AS seq_offset
FROM packed
"""


@query("pack_training_sequences", _PACK_ORACLE)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents concatenated in doc_id order and cut
    into 512-token training sequences — the global token prefix sum runs
    as the fully distributed two-pass (range partition → in-partition
    prefix sums → broadcast per-partition offsets), never a global
    ordered window; the oracle is the single-window cumulative sum."""
    return cu.pack_sequences(
        load(spark, sf_dir, "documents"), seq_tokens=_SEQ_TOKENS
    )


# ------------------------------------------------------------------
# End-to-end curation pipeline (flagship composition)
# ------------------------------------------------------------------

_PIPE_CORPUS_SQL = """
    SELECT doc_id, text, lang FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text, lang FROM documents WHERE doc_id % 5 = 0
"""

_PIPE_ORACLE = f"""
WITH corpus AS ({_PIPE_CORPUS_SQL}),
-- 1. exact dedup: min-id survivor per normalized text
survivors AS (
    SELECT min(doc_id) AS doc_id
    FROM corpus GROUP BY md5({_NORM_SQL})
),
deduped AS (
    SELECT c.doc_id, c.text, c.lang,
           string_split({_NORM_SQL}, ' ') AS w
    FROM corpus c JOIN survivors USING (doc_id)
),
-- 2. quality filter: length + per-row duplicate-word fraction
quality AS (
    SELECT doc_id, text, lang, w, len(w) AS n_tokens
    FROM deduped
    WHERE len(w) >= 10
      AND (len(w) - len(list_distinct(w))) / CAST(len(w) AS DOUBLE) <= 0.6
),
-- 3. decontamination: drop docs sharing any 3-shingle with the
--    benchmark slice (doc_id % 50 = 0 of the ORIGINAL table)
bench_sh AS (
    SELECT DISTINCT unnest(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
    FROM (SELECT string_split({_NORM_SQL}, ' ') AS w
          FROM documents WHERE doc_id % 50 = 0)
),
contaminated AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM quality
    ) q JOIN bench_sh USING (shingle)
),
clean AS (
    SELECT doc_id, lang, n_tokens FROM quality
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
-- 4. training mix: en 2.0 epochs, zh 0.5, rest 1.0 (md5-stream)
weighted AS (
    SELECT doc_id, lang, n_tokens,
           CASE lang WHEN 'en' THEN 20000 WHEN 'zh' THEN 5000
                ELSE 10000 END AS bp,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 10000 AS h
    FROM clean
),
mixture AS (
    SELECT doc_id, lang, n_tokens,
           CAST(unnest(generate_series(1, CAST(
               bp // 10000 + CASE WHEN h < bp % 10000 THEN 1 ELSE 0 END
               AS INTEGER))) AS BIGINT) AS epoch
    FROM weighted
),
-- 5. sequence packing in (doc_id, epoch) order, 256-token sequences
packed AS (
    SELECT doc_id, lang, epoch, n_tokens,
           CAST(COALESCE(sum(n_tokens) OVER (
               ORDER BY doc_id * 10 + epoch
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_tok
    FROM mixture
)
SELECT doc_id, lang, epoch, n_tokens, start_tok,
       CAST(start_tok // 256 AS BIGINT) AS first_seq,
       CAST((start_tok + n_tokens - 1) // 256 AS BIGINT) AS last_seq
FROM packed
"""


@query("curation_pipeline", _PIPE_ORACLE)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship curation composition — one declarative plan chaining
    exact dedup (min-id survivors over the dup-injected corpus), a
    per-row quality gate (length >= 10 tokens, duplicate-word fraction
    <= 0.6), benchmark decontamination (anti-join on broadcast benchmark
    shingles), deterministic training-mix sampling (en 2.0 epochs /
    zh 0.5), and distributed sequence packing into 256-token sequences.
    Every stage is an existing library operator; Catalyst fuses the
    map-side stages and AQE sizes the shuffles."""
    from ..dataops import dedup as dd
    from ..dataops.text import normalize_text, words

    docs = load(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text", "lang").unionByName(
        docs.where(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang"
        )
    )
    deduped = dd.dedup_exact(corpus)

    # token array projected once (four references below)
    w = F.col("__toks")
    dup_frac = (F.size(w) - F.size(F.array_distinct(w))) / F.size(w)
    quality = (
        deduped.withColumn("__toks", words(F.col("text")))
        .withColumn("n_tokens", F.size(w).cast("long"))
        .where((F.col("n_tokens") >= 10) & (dup_frac <= 0.6))
        .drop("__toks")
    )

    bench = docs.where(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    bench_shingles = F.broadcast(
        dd.exploded_shingles(bench).select("shingle").distinct()
    )
    q_shingles = dd.exploded_shingles(quality.select("doc_id", "text"))
    contaminated = (
        q_shingles.join(bench_shingles, "shingle").select("doc_id").distinct()
    )
    # checkpoint the two fan-out points: everything above `clean` (the
    # dedup + quality + shingle-anti-join chain) is re-derived by each
    # downstream consumer otherwise, and `mixture` feeds both the
    # packing pass and the id map (84 parquet scans in this one plan
    # without the cuts)
    clean = (
        quality.join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "n_tokens", "text")
        .localCheckpoint(eager=True)
    )

    mixture = cu.weighted_mix(clean, {"en": 20000, "zh": 5000}).localCheckpoint(
        eager=True
    )

    packed = cu.pack_sequences(
        mixture.select(
            (F.col("doc_id") * 10 + F.col("epoch")).alias("pack_id"),
            "doc_id",
            "lang",
            "epoch",
            "text",
        ),
        id_col="pack_id",
        seq_tokens=256,
    )
    ids = mixture.select(
        (F.col("doc_id") * 10 + F.col("epoch")).alias("pack_id"),
        "doc_id",
        "lang",
        "epoch",
    )
    return packed.join(ids, "pack_id").select(
        "doc_id",
        "lang",
        "epoch",
        "n_tokens",
        "start_tok",
        (F.col("start_tok") / 256).cast("long").alias("first_seq"),
        ((F.col("start_tok") + F.col("n_tokens") - 1) / 256)
        .cast("long")
        .alias("last_seq"),
    )


# ------------------------------------------------------------------
# Composite quality filter (Gopher-style rules with reasons)
# ------------------------------------------------------------------

_FILTER_ORACLE = f"""
WITH norm AS (
    SELECT doc_id, {_NORM_SQL} AS t FROM documents
),
sig AS (
    SELECT doc_id, t,
           CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(string_split(t, ' '))
                - len(list_distinct(string_split(t, ' '))) AS BIGINT)
               AS n_dup_tokens,
           CAST(length(t) - (len(string_split(t, ' ')) - 1) AS BIGINT)
               AS n_word_chars
    FROM norm
)
SELECT doc_id, n_tokens,
       n_dup_tokens / CAST(n_tokens AS DOUBLE) AS dup_word_frac,
       n_word_chars / CAST(n_tokens AS DOUBLE) AS mean_word_len,
       n_tokens < 10 AS flag_too_short,
       n_dup_tokens / CAST(n_tokens AS DOUBLE) > 0.6 AS flag_repetitive,
       (n_word_chars / CAST(n_tokens AS DOUBLE) < 3.0
        OR n_word_chars / CAST(n_tokens AS DOUBLE) > 10.0)
           AS flag_word_len,
       NOT (n_tokens < 10
            OR n_dup_tokens / CAST(n_tokens AS DOUBLE) > 0.6
            OR n_word_chars / CAST(n_tokens AS DOUBLE) < 3.0
            OR n_word_chars / CAST(n_tokens AS DOUBLE) > 10.0) AS keep
FROM sig
"""


@query("quality_filter_verdicts", _FILTER_ORACLE)
def quality_filter_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite document filter as a single map-only
    projection: token count, duplicate-word fraction, and mean word
    length feed per-rule boolean flags plus the final keep verdict —
    per-row array expressions only, no explode, no shuffle."""
    from ..dataops.text import normalize_text

    docs = load(spark, sf_dir, "documents")
    t = normalize_text(F.col("text"))
    w = F.split(t, " ")
    n_tokens = F.size(w).cast("long")
    n_dup = (F.size(w) - F.size(F.array_distinct(w))).cast("long")
    n_word_chars = (F.length(t) - (F.size(w) - 1)).cast("long")
    dup_frac = n_dup / n_tokens
    mean_wl = n_word_chars / n_tokens
    too_short = n_tokens < 10
    repetitive = dup_frac > 0.6
    word_len = (mean_wl < 3.0) | (mean_wl > 10.0)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        dup_frac.alias("dup_word_frac"),
        mean_wl.alias("mean_word_len"),
        too_short.alias("flag_too_short"),
        repetitive.alias("flag_repetitive"),
        word_len.alias("flag_word_len"),
        (~(too_short | repetitive | word_len)).alias("keep"),
    )


# ------------------------------------------------------------------
# Boilerplate line removal
# ------------------------------------------------------------------

_BOIL1 = "copyright 2024 example corp all rights reserved"
_BOIL2 = "subscribe to our newsletter for updates"
_BOIL_MIN_DOCS = 50

#: Injection: the raw corpus has no repeated lines, so footers/headers
#: are attached deterministically (2/3 of docs get BOIL1, 1/5 BOIL2).
_BOIL_CORPUS_SQL = f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || '{_BOIL1}'
                WHEN doc_id % 3 = 1 THEN '{_BOIL1}' || chr(10) || text
                ELSE text END
           || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '{_BOIL2}'
                   ELSE '' END AS text
    FROM documents
"""

_BOIL_ORACLE = f"""
WITH corpus AS ({_BOIL_CORPUS_SQL}),
t AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM corpus),
lines AS (
    SELECT doc_id, s.idx AS idx, s.line AS line
    FROM (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(l)),
                        i -> struct_pack(idx := i, line := l[i]))) AS s
          FROM t)
),
hot AS (
    SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY line
    ) WHERE nd >= {_BOIL_MIN_DOCS}
),
kept AS (SELECT lines.* FROM lines ANTI JOIN hot USING (line)),
rebuilt AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           md5(string_agg(line, chr(10) ORDER BY idx)) AS clean_md5
    FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines FROM t)
SELECT totals.doc_id, totals.n_lines,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(r.clean_md5, md5('')) AS clean_md5
FROM totals LEFT JOIN rebuilt r USING (doc_id)
"""


@query("remove_boilerplate_lines", _BOIL_ORACLE)
def remove_boilerplate_lines_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Boilerplate removal: lines shared by >= 50 distinct documents
    (injected footers/headers) are stripped corpus-wide and each doc is
    rebuilt in original line order — exact count-distinct per line,
    anti-join against the (tiny) hot set, per-doc ordered rebuild."""
    docs = load(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.col("text"), F.lit("\n" + _BOIL1)),
            )
            .when(
                F.col("doc_id") % 3 == 1,
                F.concat(F.lit(_BOIL1 + "\n"), F.col("text")),
            )
            .otherwise(F.col("text")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit("\n" + _BOIL2)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = cu.remove_boilerplate_lines(injected, min_docs=_BOIL_MIN_DOCS)
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.md5("clean_text").alias("clean_md5"),
    )


# ------------------------------------------------------------------
# Curation pipeline v2 (boilerplate + containment aware)
# ------------------------------------------------------------------

#: Normalized clean_text (twin of dataops.text.normalize_text on the
#: rebuilt column).
_NORMC_SQL = "lower(trim(regexp_replace(clean_text, '\\s+', ' ', 'g')))"

#: v2 corpus: originals with injected boilerplate (per the _BOIL rules),
#: plain-text copies of every doc_id % 5 == 0 (exact dups ONLY after
#: boilerplate removal — the ordering lesson), and 12-word snippet docs
#: of every doc_id % 7 == 0 (long enough to pass the length gate, so
#: only containment dedup catches them).
_PIPE2_CORPUS_SQL = f"""
    {_BOIL_CORPUS_SQL}
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents
    WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id,
           array_to_string(string_split({_NORM_SQL}, ' ')[1:12], ' ') AS text
    FROM documents WHERE doc_id % 7 = 0
"""

_PIPE2_ORACLE = f"""
WITH corpus AS ({_PIPE2_CORPUS_SQL}),
-- stage 1: boilerplate line removal (lines in >= {_BOIL_MIN_DOCS} docs)
t AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM corpus),
lines AS (
    SELECT doc_id, s.idx AS idx, s.line AS line
    FROM (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(l)),
                        i -> struct_pack(idx := i, line := l[i]))) AS s
          FROM t)
),
hot AS (
    SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY line
    ) WHERE nd >= {_BOIL_MIN_DOCS}
),
kept AS (SELECT lines.* FROM lines ANTI JOIN hot USING (line)),
rebuilt AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           string_agg(line, chr(10) ORDER BY idx) AS clean_text
    FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines FROM t),
cleaned AS (
    SELECT totals.doc_id, totals.n_lines,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(r.clean_text, '') AS clean_text
    FROM totals LEFT JOIN rebuilt r USING (doc_id)
),
-- stage 2: exact dedup on the CLEANED text (min-id survivor)
canon AS (
    SELECT min(doc_id) AS doc_id FROM cleaned GROUP BY md5({_NORMC_SQL})
),
flagged AS (
    SELECT c.*, (s.doc_id IS NULL) AS is_exact_dup
    FROM cleaned c LEFT JOIN canon s USING (doc_id)
),
-- stage 3: substring containment among survivors (anchor-shingle
-- candidates, hot-anchor cap, padded substring verify)
normw AS (
    SELECT doc_id, {_NORMC_SQL} AS nrm,
           string_split({_NORMC_SQL}, ' ') AS w
    FROM flagged WHERE NOT is_exact_dup
),
shingles AS (
    SELECT DISTINCT doc_id,
           unnest(list_slice(w, 1, greatest(len(w) - 2, 0))) || ' ' ||
           unnest(list_slice(w, 2, greatest(len(w) - 1, 0))) || ' ' ||
           unnest(list_slice(w, 3, len(w))) AS shingle
    FROM normw
),
-- hash-bucket cap, mirroring dataops.dedup.substring_containment
hashed AS (
    SELECT doc_id, {md5_int60_sql('shingle')} AS h FROM shingles
),
kept_sh AS (
    SELECT h FROM hashed
    GROUP BY h HAVING count(*) <= {dd.DEFAULT_MAX_BUCKET_SIZE}
),
sh AS (SELECT s.doc_id, s.h FROM hashed s JOIN kept_sh USING (h)),
anchors AS (
    SELECT doc_id AS contained_id, nrm AS a_nrm,
           {md5_int60_sql("w[1] || ' ' || w[2] || ' ' || w[3]")} AS anchor_h
    FROM normw WHERE len(w) >= 3
),
contained AS (
    SELECT DISTINCT c.contained_id AS doc_id FROM (
        SELECT DISTINCT a.contained_id, s.doc_id AS container_id, a.a_nrm
        FROM anchors a
        JOIN sh s ON s.h = a.anchor_h AND s.doc_id <> a.contained_id
    ) c JOIN normw b ON b.doc_id = c.container_id
    WHERE strpos(' ' || b.nrm || ' ', ' ' || c.a_nrm || ' ') > 0
),
-- stage 4: length gate on cleaned tokens
tok AS (
    SELECT doc_id,
           CAST(len(string_split({_NORMC_SQL}, ' ')) AS BIGINT) AS n_tokens
    FROM cleaned
)
SELECT f.doc_id, f.n_lines, f.n_kept, t.n_tokens,
       f.is_exact_dup,
       (co.doc_id IS NOT NULL) AS is_contained,
       (t.n_tokens < 10) AS flag_short,
       (NOT f.is_exact_dup AND co.doc_id IS NULL AND t.n_tokens >= 10)
           AS keep
FROM flagged f
JOIN tok t USING (doc_id)
LEFT JOIN contained co USING (doc_id)
"""


@query("curation_pipeline_v2", _PIPE2_ORACLE)
def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline v2 — the per-document verdict ledger of a
    4-stage cleanse whose STAGE ORDER is the point: corpus-wide
    boilerplate line removal must run BEFORE exact dedup (injected
    copies differ from their originals only by boilerplate, so dedup
    on raw bytes would miss them), and substring-containment dedup
    catches the 12-word snippet docs that sail through the length
    gate.  Stages are the library operators unchanged
    (remove_boilerplate_lines, exact_dup_groups, substring_containment
    with its default hot-anchor cap); the cleaned frame is persisted
    once and reused by all three downstream stages.  Output: one row
    per corpus doc with per-stage flags and the final keep verdict."""
    from ..dataops import dedup as dd
    from ..dataops.text import normalize_text, words
    from ..functions import caching

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.col("text"), F.lit("\n" + _BOIL1)),
            )
            .when(
                F.col("doc_id") % 3 == 1,
                F.concat(F.lit(_BOIL1 + "\n"), F.col("text")),
            )
            .otherwise(F.col("text")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit("\n" + _BOIL2)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    copies = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    w = words(F.col("text"))
    snippets = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        # concat_ws silently collapses a NULL token array to '' — a
        # null doc's snippet must stay NULL like every other stage
        # (and like the oracle's array_to_string null propagation)
        F.when(
            F.col("text").isNotNull(),
            F.concat_ws(" ", F.slice(w, 1, 12)),
        ).alias("text"),
    )
    corpus = injected.unionByName(copies).unionByName(snippets)

    # localCheckpoint, not persist: three downstream stages each embed
    # this frame's plan (the boilerplate stage is itself a corpus-wide
    # aggregate + join), and with a plain persist Catalyst re-optimizes
    # that subplan in every branch — the checkpoint truncates it to a
    # constant-size scan (9.7s → 7.0s at sf0.1).  Blocks are released
    # by the ContextCleaner when the frame goes out of scope.
    cleaned = cu.remove_boilerplate_lines(
        corpus, min_docs=_BOIL_MIN_DOCS
    ).localCheckpoint(eager=True)
    caching.track(cleaned)

    canon = dd.exact_dup_groups(
        cleaned, text_col="clean_text", id_col="doc_id"
    ).select(F.col("canonical_id").alias("doc_id"), F.lit(True).alias("__srv"))
    flagged = (
        cleaned.join(canon, "doc_id", "left")
        .withColumn("is_exact_dup", F.col("__srv").isNull())
        .drop("__srv")
    )

    surv = flagged.where(~F.col("is_exact_dup")).select(
        "doc_id", "clean_text"
    )
    contained = (
        dd.substring_containment(surv, text_col="clean_text")
        .select(F.col("contained_id").alias("doc_id"))
        .distinct()
        .withColumn("__c", F.lit(True))
    )

    out = (
        flagged.withColumn(
            "n_tokens",
            F.size(
                F.split(normalize_text(F.col("clean_text")), " ")
            ).cast("long"),
        )
        .join(contained, "doc_id", "left")
        .withColumn("is_contained", F.coalesce(F.col("__c"), F.lit(False)))
    )
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        "n_tokens",
        "is_exact_dup",
        "is_contained",
        (F.col("n_tokens") < 10).alias("flag_short"),
        (
            ~F.col("is_exact_dup")
            & ~F.col("is_contained")
            & (F.col("n_tokens") >= 10)
        ).alias("keep"),
    )


# ------------------------------------------------------------------
# Curation pipeline v3: the round-5 operators composed
# (chunk-novelty gate x LM-typicality band)
# ------------------------------------------------------------------

#: Keep a doc iff >= half its tokens survive corpus chunk-dedup AND
#: its avg bit-surprisal sits inside [lo, hi] (too low = boilerplate,
#: too high = alien/garbled — the two-sided perplexity filter).
_V3_SURPRISAL_LO = 500
_V3_SURPRISAL_HI = 9000

_V3_ORACLE = f"""
WITH w AS (
    SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
),
tokpos AS (
    SELECT doc_id, unnest(toks) AS tok,
           unnest(generate_series(1, len(toks))) AS pos
    FROM w
),
chunks AS (
    SELECT doc_id,
           CAST((pos - 1) // {_DCHUNK} AS BIGINT) AS chunk_index,
           CAST(count(*) AS BIGINT) AS n_chunk_tokens,
           string_agg(tok, ' ' ORDER BY pos) AS chunk_text
    FROM tokpos
    GROUP BY doc_id, (pos - 1) // {_DCHUNK}
),
ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY md5(chunk_text)
                              ORDER BY doc_id, chunk_index) AS rk
    FROM chunks
),
novelty AS (
    SELECT doc_id,
           CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN rk = 1 THEN n_chunk_tokens ELSE 0 END)
                AS BIGINT) AS kept_tokens
    FROM ranked GROUP BY doc_id
),
grams AS (
    SELECT doc_id,
           unnest(list_slice(toks, 1, len(toks) - 1)) || ' ' ||
           unnest(list_slice(toks, 2, len(toks))) AS gram
    FROM (SELECT doc_id, toks FROM w WHERE len(toks) >= 2)
),
counts AS (
    SELECT gram, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY gram
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM counts),
scored AS (
    SELECT doc_id,
           CAST(floor(log2(t)) - floor(log2(c)) AS BIGINT) AS bits
    FROM grams JOIN counts USING (gram) CROSS JOIN tot
),
typicality AS (
    SELECT doc_id,
           CAST(sum(bits) * 1000 // count(*) AS BIGINT)
               AS avg_surprisal_milli
    FROM scored GROUP BY doc_id
)
SELECT n.doc_id, n.n_tokens, n.kept_tokens,
       COALESCE(t.avg_surprisal_milli, 0) AS avg_surprisal_milli,
       (n.kept_tokens * 2 >= n.n_tokens) AS novel_enough,
       (COALESCE(t.avg_surprisal_milli, 0) BETWEEN {_V3_SURPRISAL_LO}
            AND {_V3_SURPRISAL_HI}) AS typicality_ok,
       ((n.kept_tokens * 2 >= n.n_tokens)
        AND COALESCE(t.avg_surprisal_milli, 0)
            BETWEEN {_V3_SURPRISAL_LO} AND {_V3_SURPRISAL_HI}) AS keep
FROM novelty n LEFT JOIN typicality t ON t.doc_id = n.doc_id
"""


@query("curation_pipeline_v3", _V3_ORACLE)
def curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline v3 — this round's operators composed into one
    per-document verdict ledger: corpus-wide chunk dedup
    (dedup_corpus_chunks) yields each doc's NOVELTY (fraction of its
    tokens that are the corpus-first copy), the LM-typicality score
    (lm_typicality) gives the two-sided perplexity band (too low =
    boilerplate, too high = garbled), and the keep verdict is their
    conjunction — all exact integers.  The chunk stats and the bigram
    model each cost their documented shuffles; the final assembly is
    two doc-keyed joins that AQE plans as small-table broadcasts."""
    from ..dataops.text import words as _words

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    chunks = cu.chunk_documents(
        docs, chunk_tokens=_DCHUNK, overlap=0
    ).withColumn("chunk_hash", F.md5(F.col("chunk_text")))
    from pyspark.sql import Window

    wdw = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_index")
    ranked = chunks.withColumn("rk", F.row_number().over(wdw))
    novelty = ranked.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").cast("long").alias("n_tokens"),
        F.sum(
            F.when(F.col("rk") == 1, F.col("n_chunk_tokens")).otherwise(0)
        )
        .cast("long")
        .alias("kept_tokens"),
    )
    typ = cu.lm_typicality(docs).select("doc_id", "avg_surprisal_milli")
    out = novelty.join(typ, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "kept_tokens",
        F.coalesce(F.col("avg_surprisal_milli"), F.lit(0))
        .cast("long")
        .alias("avg_surprisal_milli"),
    )
    novel = F.col("kept_tokens") * 2 >= F.col("n_tokens")
    typical = F.col("avg_surprisal_milli").between(
        _V3_SURPRISAL_LO, _V3_SURPRISAL_HI
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "kept_tokens",
        "avg_surprisal_milli",
        novel.alias("novel_enough"),
        typical.alias("typicality_ok"),
        (novel & typical).alias("keep"),
    )


# ------------------------------------------------------------------
# Corpus novelty saturation (unique-gram growth curve)
# ------------------------------------------------------------------

_NOVELTY_ORACLE = f"""
WITH w AS (
    SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id,
           unnest(list_slice(toks, 1, len(toks) - 1)) || ' ' ||
           unnest(list_slice(toks, 2, len(toks))) AS gram
    FROM (SELECT doc_id, toks FROM w WHERE len(toks) >= 2)
),
owners AS (
    SELECT gram, CAST(min(doc_id) AS BIGINT) AS owner FROM grams
    GROUP BY gram
),
per_doc AS (
    SELECT d.doc_id,
           CAST(count(o.gram) AS BIGINT) AS new_grams
    FROM (SELECT DISTINCT doc_id FROM grams) d
    LEFT JOIN owners o ON o.owner = d.doc_id
    GROUP BY d.doc_id
),
tot AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct
    FROM grams GROUP BY doc_id
)
SELECT t.doc_id, t.n_grams, t.n_distinct, p.new_grams,
       CAST(sum(p.new_grams) OVER (ORDER BY t.doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_unique_grams,
       CAST(p.new_grams * 1000000 // t.n_grams AS BIGINT)
           AS novelty_ppm
FROM tot t JOIN per_doc p USING (doc_id)
"""


@query("corpus_novelty_curve", _NOVELTY_ORACLE)
def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus saturation bookkeeping: in doc_id (crawl) order, how
    many bigrams does each document contribute that NO earlier doc
    contains — the marginal-diversity curve that tells a crawl
    operator when additional volume stops adding new content.  Each
    gram's first owner is its min doc_id (one gram-keyed aggregation —
    never a doc×doc comparison); per-doc novelty joins back and a
    running sum renders the cumulative unique-gram curve.  novelty_ppm
    = new grams per million occurrences in the doc — the per-doc
    marginal value signal.  The global ordered window runs over one
    row per doc (bounded), not over gram occurrences."""
    from ..dataops.curate import token_bigrams
    from ..dataops.text import words

    docs = load(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", words(F.col("text")).alias("__toks")
    ).select(
        "doc_id",
        F.explode(token_bigrams(F.col("__toks"))).alias("gram"),
    )
    from ..functions import caching

    grams = caching.track(grams.persist())
    owners = grams.groupBy("gram").agg(
        F.min("doc_id").cast("long").alias("owner")
    )
    per_doc = owners.groupBy(F.col("owner").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("new_grams")
    )
    tot = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.countDistinct("gram").cast("long").alias("n_distinct"),
    )
    joined = tot.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.coalesce(F.col("new_grams"), F.lit(0)).cast("long").alias(
            "new_grams"
        ),
    )
    summed = cu.distributed_prefix_sum(
        joined,
        order_col="doc_id",
        value_col="new_grams",
        out_col="cum_unique_grams",
        exclusive=False,
    )
    return summed.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        "new_grams",
        "cum_unique_grams",
        F.expr("CAST(new_grams * 1000000 div n_grams AS BIGINT)").alias(
            "novelty_ppm"
        ),
    )
