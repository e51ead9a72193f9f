"""Shared corpus-inflation helper for the soak scripts.

One definition of the documents-table inflation scheme (per-copy
doc_id offset + PREPENDED copy tag) so it cannot drift between soaks:
the tag must LEAD the text because anchor/prefix-blocked operators
(substring containment, fuzzy prefix linkage) key on the first tokens —
a trailing tag leaves every copy's prefix identical and manufactures
~copies² cross-copy candidate pairs, measuring synthetic dup explosion
instead of the operator (first run of the r6 composition soak hit
exactly that; see BENCH_HISTORY).
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: doc_id stride between copies: above the sf0.1 corpus' max doc_id
#: (4999) and below the +1M synthetic-id offsets some queries inject.
DOC_COPY_STRIDE = 5_000


def write_inflated_documents(
    spark, src: str, out_dir: str, mult: int, *, stride: int = DOC_COPY_STRIDE
) -> None:
    """Write ``{out_dir}/documents.parquet`` holding ``mult`` tagged
    copies of ``{src}/documents.parquet``.  ``stride`` is the per-copy
    doc_id offset — pass the embeddings stride when a composition soak
    must keep doc_id/vec_id alignment across both inflated tables."""
    docs = spark.read.parquet(f"{src}/documents.parquet")
    parts = []
    for c in range(mult):
        parts.append(
            docs.select(
                (F.col("doc_id") + c * stride).alias("doc_id"),
                F.concat(F.lit(f"copytag{c} "), F.col("text")).alias("text"),
                *[x for x in docs.columns if x not in ("doc_id", "text")],
            )
        )
    inflated = parts[0]
    for p in parts[1:]:
        inflated = inflated.unionByName(p)
    inflated.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
