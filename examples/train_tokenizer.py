#!/usr/bin/env python
"""Tokenizer-training demo: corpus → BPE merge table → subword stats.

    python examples/train_tokenizer.py [--sf /root/testdata/sf0.01] \
        [--merges 16]

The vocabulary-induction loop every tokenizer build runs, Spark-first:
one corpus-scale word count, then ``--merges`` iterations over the
(bounded, language-sized) vocabulary — the driver holds only the merge
table.  Prints the learned merges, then applies them to the corpus
vocabulary and reports the compression trajectory (weighted tokens per
word before vs after).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from credit_card_etl_pipeline_spark.dataops import bpe  # noqa: E402
from credit_card_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--merges", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark(app_name="train_tokenizer")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")

    vocab = bpe.word_vocab(docs).persist()
    n_words, n_forms = (
        vocab.agg(F.sum("cnt"), F.count(F.lit(1))).first()
    )
    print(f"vocabulary: {n_forms} distinct alpha words / {n_words} tokens")

    merges = bpe.learn_merges(vocab, n_merges=args.merges)
    print(f"\nlearned {len(merges)} merges:")
    for i, (left, right, cnt) in enumerate(merges, 1):
        print(f"  {i:3d}. {left!r} + {right!r} -> {left + right!r}  ({cnt}x)")

    segmented = vocab.select(
        "cnt",
        F.length("word").alias("n_chars"),
        F.size(
            F.split(bpe.apply_merges(bpe.symbolize(F.col("word")), merges), " ")
        ).alias("n_sub"),
    )
    chars, subs = segmented.agg(
        F.sum(F.col("cnt") * F.col("n_chars")),
        F.sum(F.col("cnt") * F.col("n_sub")),
    ).first()
    vocab.unpersist()
    print(
        f"\ncorpus-weighted: {chars} chars -> {subs} subword tokens "
        f"({chars / subs:.2f} chars/token vs 1.00 at the char baseline)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
