"""Cross-engine-stable integer hashing.

The dataops layer (dedup, LSH, fingerprints) needs a hash that is (a)
computable as a native JVM expression and (b) reproducible in ANSI SQL
for the DuckDB oracles — so none of Spark's ``hash``/``xxhash64``
(engine-private seeds) qualify.  We use the leading 60 bits of md5,
which both engines expose: Spark ``conv(substring(md5(x),1,15),16,10)``
== DuckDB ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1: universal-hash modulus.  Residues < 2^31 keep
#: ``a*x + b`` within int64 for a,b < P.
MERSENNE_P = 2_147_483_647

#: Fixed (a, b) pairs for the minhash permutation family
#: h_j(x) = (a_j * x + b_j) mod P.  Literal constants so the DuckDB
#: oracle can embed identical values.
MINHASH_COEFFS: list[tuple[int, int]] = [
    (1103515245, 12345),
    (1588635695, 479001599),
    (784588716, 982451653),
    (885570937, 472882027),
    (687799715, 715225739),
    (419048497, 433024223),
    (570643069, 297779117),
    (41208917, 104395303),
]


def md5_int60(col: Column) -> Column:
    """Positive 60-bit integer from the md5 of ``col``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int60_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_int60`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_residue(col: Column) -> Column:
    """Shingle hash reduced into the universal-hash domain [0, P)."""
    return md5_int60(col) % MERSENNE_P


def minhash_residue_sql(expr: str) -> str:
    return f"({md5_int60_sql(expr)} % {MERSENNE_P})"
