"""BPE tokenizer vocabulary induction (engine extension).

Classic byte-pair-encoding merge learning (Sennrich et al. 2016 —
public algorithm) re-expressed Spark-first for a training-data
pipeline:

* **One corpus-scale pass** builds the word vocabulary (explode +
  map-side-combinable groupBy).  Every merge iteration after that runs
  on the *vocabulary*, whose size is bounded by language (distinct
  words), not by corpus size — the 100 TB shape is "touch the corpus
  once, iterate on the dictionary".
* **Driver state is the merge table itself** (``n_merges`` rows); each
  iteration collects exactly one argmax row.  No corpus data ever
  reaches the driver.
* **The merge is a sequential string fold** (greedy left-to-right,
  non-overlapping — the standard BPE application order) implemented as
  a JVM-side ``aggregate`` over the symbol array: no UDF, no shuffle.
  A plain string-replace would diverge on overlapping runs (``a a a a``
  must merge to ``aa aa``, but non-overlapping scan-after-replacement
  yields ``aa a a``) — the fold gets this right and has an exact DuckDB
  ``list_reduce`` twin, so learned merges are hash-checkable
  cross-engine.

Production BPE learners amortize further (only pair counts touching
the previous merge change, so thousands of merges batch per vocabulary
scan); the per-iteration cost here is one vocabulary-scale aggregation,
which is the honest distributed baseline of the same algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import words

#: Vocabulary filter: lowercase-alpha words of the normalized text.
#: Sidesteps cross-engine unicode segmentation (Java regex ``.`` is a
#: UTF-16 unit, RE2's a codepoint) — symbols are single ASCII letters.
ALPHA_WORD_RE = "^[a-z]+$"


def word_vocab(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Corpus → ``(word, cnt)`` vocabulary of lowercase-alpha words.

    The only corpus-scale stage of BPE learning: one explode + one
    partial-aggregatable groupBy on the word key."""
    w = df.select(F.explode(words(F.col(text_col))).alias("word"))
    return (
        w.where(F.col("word").rlike(ALPHA_WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def symbolize(col: Column) -> Column:
    """``'hello'`` → ``'h e l l o'`` (space-joined single-char symbols
    — the BPE start state; symbols never contain spaces)."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


def pair_array(ws: Column) -> Column:
    """Adjacent symbol pairs (``'l r'`` strings) of a symbol string."""
    w = F.split(ws, " ")
    return F.when(
        F.size(w) >= 2,
        # sequence(1, 0) would DESCEND in Spark — the guard above
        # keeps the range non-empty.
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda j: F.concat_ws(
                " ", F.element_at(w, j), F.element_at(w, j + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def apply_merge(ws: Column, left: str, right: str) -> Column:
    """Apply ONE learned merge to a symbol string: every greedy
    left-to-right non-overlapping occurrence of ``left right`` becomes
    the fused symbol.  Sequential fold over the symbol array; the
    DuckDB twin is ``list_reduce`` (first-element seeded — the
    empty-accumulator branch below makes the two folds identical)."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        hit = ((acc == left) | acc.endswith(" " + left)) & (x == right)
        fused = F.concat(
            F.substring(acc, F.lit(1), F.length(acc) - len(left)),
            F.lit(merged),
        )
        return (
            F.when(acc == "", x)
            .when(hit, fused)
            .otherwise(F.concat(acc, F.lit(" "), x))
        )

    return F.aggregate(F.split(ws, " "), F.lit(""), step)


def apply_merges(
    col: Column, merges: list[tuple[str, str, int]]
) -> Column:
    """Apply a learned merge list in order to a symbol string."""
    out = col
    for left, right, _ in merges:
        out = apply_merge(out, left, right)
    return out


def learn_merges(
    vocab: DataFrame, *, n_merges: int = 8
) -> list[tuple[str, str, int]]:
    """Iterative BPE merge induction over a ``(word, cnt)`` vocabulary.

    Each iteration: count adjacent symbol pairs weighted by word
    frequency (one vocabulary-scale groupBy), collect the single argmax
    row (tiebreak: count desc, pair asc — deterministic cross-engine),
    and fold the winning merge into every symbol string.  Returns
    ``[(left, right, pair_count), ...]`` in merge order."""
    from ..functions import caching

    sym = caching.track(
        vocab.select(
            symbolize(F.col("word")).alias("ws"), "cnt"
        ).persist()
    )
    merges: list[tuple[str, str, int]] = []
    cur = sym
    for _ in range(n_merges):
        best = (
            cur.select(F.explode(pair_array(F.col("ws"))).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["pair"].split(" ")
        merges.append((left, right, best[0]["c"]))
        cur = cur.select(
            apply_merge(F.col("ws"), left, right).alias("ws"), "cnt"
        )
    return merges
