"""BPE vocabulary-induction queries: the genuinely iterative merge
learner unrolled into hash-checked DuckDB oracles (same pattern as the
IVF k-means fit — deterministic integer argmax per step, so N unrolled
CTE stages reproduce the Spark loop bit-for-bit).

The merge list is a pure function of the corpus, so it is learned once
per sf_dir and memoized (at scale: learn offline, broadcast the merge
table to the tokenizer pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dataops import bpe
from . import load, query
from .dataops_queries import _NORM_SQL

_N_MERGES = 8
_TOP_WORDS = 50

# ------------------------------------------------------------------
# Shared oracle fragments
# ------------------------------------------------------------------

#: Vocabulary + start state: lowercase-alpha words of the normalized
#: text, each exploded into space-joined single-char symbols.
_VOCAB_SQL = rf"""
vocab AS (
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS word
          FROM documents)
    WHERE regexp_matches(word, '^[a-z]+$')
    GROUP BY word
),
sym0 AS (
    SELECT trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS ws, cnt
    FROM vocab
)"""


def _merge_fold_sql(sym_expr: str) -> str:
    """The greedy left-to-right merge fold (twin of bpe.apply_merge);
    ``b`` is the current step's 1-row best-pair relation."""
    return f"""list_reduce(string_split({sym_expr}, ' '),
        (acc, x) -> CASE
            WHEN (acc = b.left_sym OR ends_with(acc, ' ' || b.left_sym))
                 AND x = b.right_sym
            THEN substr(acc, 1, len(acc) - len(b.left_sym))
                 || b.left_sym || b.right_sym
            ELSE acc || ' ' || x END)"""


def _bpe_step_sql(i: int) -> str:
    """One unrolled merge iteration: weighted adjacent-pair counts →
    deterministic argmax (count desc, pair asc) → fold the winning
    merge into every vocabulary symbol string."""
    return f"""
pairs{i} AS (
    SELECT unnest(list_transform(
               generate_series(1, greatest(len(w) - 1, 0)),
               j -> w[j] || ' ' || w[j + 1])) AS pair,
           cnt
    FROM (SELECT string_split(ws, ' ') AS w, cnt FROM sym{i - 1})
),
best{i} AS (
    SELECT CAST({i} AS BIGINT) AS step,
           string_split(pair, ' ')[1] AS left_sym,
           string_split(pair, ' ')[2] AS right_sym,
           CAST(sum(cnt) AS BIGINT) AS pair_count
    FROM pairs{i}
    GROUP BY pair
    ORDER BY pair_count DESC, pair ASC
    LIMIT 1
),
sym{i} AS (
    SELECT {_merge_fold_sql('ws')} AS ws, cnt
    FROM sym{i - 1}, best{i} b
)"""


_STEPS_SQL = ",".join(_bpe_step_sql(i) for i in range(1, _N_MERGES + 1))

_LEARN_ORACLE = f"""
WITH {_VOCAB_SQL},{_STEPS_SQL}
SELECT step, left_sym, right_sym,
       left_sym || right_sym AS merged, pair_count
FROM ({" UNION ALL ".join(f"SELECT * FROM best{i}" for i in range(1, _N_MERGES + 1))})
"""

_TOKENIZE_ORACLE = f"""
WITH {_VOCAB_SQL},{_STEPS_SQL},
tok0 AS (
    SELECT word, cnt, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS ws
    FROM (SELECT word, cnt FROM vocab
          ORDER BY cnt DESC, word ASC LIMIT {_TOP_WORDS})
),{",".join(
    f'''
tok{i} AS (
    SELECT word, cnt, {_merge_fold_sql("ws")} AS ws
    FROM tok{i - 1}, best{i} b
)''' for i in range(1, _N_MERGES + 1))}
SELECT word, cnt, ws AS subword_text,
       CAST(len(string_split(ws, ' ')) AS BIGINT) AS n_subtokens
FROM tok{_N_MERGES}
"""

# ------------------------------------------------------------------
# Spark queries
# ------------------------------------------------------------------

#: Merge-list memo (pure function of the corpus — see module doc).
_MERGE_CACHE: dict[tuple[str, int], list[tuple[str, str, int]]] = {}


def _merges(spark: SparkSession, sf_dir: str) -> list[tuple[str, str, int]]:
    key = (sf_dir, _N_MERGES)
    if key not in _MERGE_CACHE:
        vocab = bpe.word_vocab(load(spark, sf_dir, "documents"))
        _MERGE_CACHE[key] = bpe.learn_merges(vocab, n_merges=_N_MERGES)
    return _MERGE_CACHE[key]


@query("bpe_learn_merges", _LEARN_ORACLE)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge induction over the documents vocabulary: 8 iterations
    of weighted pair-count argmax + symbol fold.  One corpus pass, then
    vocabulary-scale iterations with 1-row driver collects; the oracle
    unrolls the identical loop as DuckDB CTE stages."""
    rows = [
        (i + 1, left, right, left + right, cnt)
        for i, (left, right, cnt) in enumerate(_merges(spark, sf_dir))
    ]
    return spark.createDataFrame(
        rows,
        "step long, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )


@query("bpe_tokenize_top_words", _TOKENIZE_ORACLE)
def bpe_tokenize_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge list to the 50 most frequent vocabulary
    words (deterministic count-desc/word-asc cut): subword segmentation
    as 8 chained JVM-side folds — map-only over the word set."""
    merges = _merges(spark, sf_dir)
    vocab = (
        bpe.word_vocab(load(spark, sf_dir, "documents"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(_TOP_WORDS)
    )
    ws = bpe.apply_merges(bpe.symbolize(F.col("word")), merges)
    return vocab.select(
        "word",
        "cnt",
        ws.alias("subword_text"),
        F.size(F.split(ws, " ")).cast("long").alias("n_subtokens"),
    )
