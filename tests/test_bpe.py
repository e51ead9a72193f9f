"""BPE merge induction: hand-computed merge sequences, greedy
non-overlapping fold semantics, and application edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from credit_card_etl_pipeline_spark.dataops import bpe


def _fold(spark, ws: str, left: str, right: str) -> str:
    df = spark.createDataFrame([(ws,)], "ws string")
    return df.select(
        bpe.apply_merge(F.col("ws"), left, right).alias("out")
    ).first()["out"]


def test_apply_merge_overlapping_run(spark):
    # Greedy left-to-right non-overlapping: aaaa -> (aa)(aa), not (aa)a a
    assert _fold(spark, "a a a a", "a", "a") == "aa aa"
    assert _fold(spark, "a a a", "a", "a") == "aa a"


def test_apply_merge_respects_symbol_boundaries(spark):
    # 'b a' must not match inside the fused symbol 'ab'
    assert _fold(spark, "ab a b", "b", "a") == "ab a b"
    assert _fold(spark, "ab a b", "a", "b") == "ab ab"


def test_apply_merge_single_symbol_and_miss(spark):
    assert _fold(spark, "a", "a", "a") == "a"
    assert _fold(spark, "x y z", "a", "b") == "x y z"


def test_learn_merges_hand_computed(spark):
    # Vocabulary: low(5) lower(2) newest(6) widest(3) — the classic
    # Sennrich example shape.  Step 1: 'e s' appears in newest(6) and
    # widest(3) -> 9, the max.  Step 2: 'es t' -> 9 again.
    vocab = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, cnt long",
    )
    merges = bpe.learn_merges(vocab, n_merges=3)
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t", 9)
    # Step 3: 'l o' in low(5)+lower(2) = 7 beats everything else
    assert merges[2] == ("l", "o", 7)


def test_apply_merges_composes(spark):
    vocab = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, cnt long",
    )
    merges = bpe.learn_merges(vocab, n_merges=3)
    df = spark.createDataFrame([("newest",), ("slowest",)], "word string")
    out = {
        r["word"]: r["out"]
        for r in df.select(
            "word",
            bpe.apply_merges(
                bpe.symbolize(F.col("word")), merges
            ).alias("out"),
        ).collect()
    }
    assert out["newest"] == "n e w est"
    # unseen word still segments with the learned merges
    assert out["slowest"] == "s lo w est"


def test_word_vocab_filters_non_alpha(spark):
    df = spark.createDataFrame(
        [("The cat, the CAT and 42 cats!",)], "text string"
    )
    rows = {
        r["word"]: r["cnt"] for r in bpe.word_vocab(df).collect()
    }
    # normalized lowercase; 'cat,'/'cats!'/'42' fail the alpha filter
    assert rows == {"the": 2, "cat": 1, "and": 1}


def test_bpe_invariants_on_random_vocabulary(spark):
    # lossless: symbols concat back to the word; monotone: merges only
    # ever shrink the token count; checked over one batch job
    import random

    rng = random.Random(7)
    words = sorted(
        {
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 8)))
            for _ in range(200)
        }
    )
    vocab = spark.createDataFrame(
        [(w, 1) for w in words], "word string, cnt long"
    )
    merges = bpe.learn_merges(vocab, n_merges=4)
    assert len(merges) == 4  # dense ab-alphabet always has pairs
    out = vocab.select(
        "word",
        bpe.apply_merges(bpe.symbolize(F.col("word")), merges).alias("ws"),
    ).collect()
    for r in out:
        syms = r["ws"].split(" ")
        assert "".join(syms) == r["word"]
        assert len(syms) <= len(r["word"])
