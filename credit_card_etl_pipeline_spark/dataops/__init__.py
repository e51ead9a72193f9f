"""LLM training-data pipeline operators (engine extension surface).

Beyond the reference's credit-card analytics, this package adds the
operations a large-scale corpus pipeline needs, all Spark-first:

* :mod:`.dedup` — exact dedup, MinHash+LSH near-dup banding, SimHash,
  n-gram Jaccard.
* :mod:`.text` — normalization, token counting, quality metrics,
  script-ratio language guessing, fingerprints.
* :mod:`.similarity` — embedding cosine top-k (exact brute force) and
  an LSH-bucketed approximate variant for scale.
* :mod:`.multimodal` — binary media columns with typed metadata and
  Arrow-batched decode plumbing (decoders stubbed: codec libraries are
  not part of the engine's dependency set).

Everything is native-expression or Arrow-batched; hashing is
cross-engine stable (functions.hashing) so each operator carries a
DuckDB oracle in queries/dataops_queries.
"""
