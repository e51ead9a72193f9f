"""Bit-level property tests for the Morton/z-order helpers.

The module's contract (functions/zorder.py) is cross-engine bit
reproducibility: the Spark expression, the DuckDB twin SQL, and the
mathematical definition (bit i of x&MASK lands at position 2i, of y at
2i+1) must agree EXACTLY — including on adversarial inputs the lineitem
keys never exercise: negatives (two's-complement masking), values past
31 bits (masked away), and nulls (propagate on both engines).

Strategy: hypothesis drives a pure-Python big-int model hard (cheap, no
Spark); a second layer replays hypothesis-generated batches through
real Spark AND DuckDB against that model, few examples but full-engine.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from credit_card_etl_pipeline_spark.functions.zorder import (
    _SPREAD_STEPS,
    BUCKET_BITS,
    INPUT_MASK,
    morton_interleave,
    morton_interleave_sql,
    morton_key,
    range_bucket,
)

# int64-range values, weighted toward the nasty edges
_i64 = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.sampled_from(
        [0, -1, 1, INPUT_MASK, INPUT_MASK + 1, 2**31, -(2**31),
         2**62, -(2**62), 2**63 - 1, -(2**63)]
    ),
)


def _spread_model(x: int) -> int:
    x &= INPUT_MASK
    for shift, mask in _SPREAD_STEPS:
        x = (x | (x << shift)) & mask
    return x


def _morton_model(x: int, y: int) -> int:
    return _spread_model(x) | (_spread_model(y) << 1)


@given(_i64, _i64)
@settings(max_examples=500, deadline=None)
def test_spread_matches_bit_definition(x: int, y: int) -> None:
    """The parallel-prefix spread IS the per-bit definition: bit i of
    the masked input lands at even position 2i (x) / odd 2i+1 (y),
    nothing else is set, and the result is a non-negative int64."""
    z = _morton_model(x, y)
    # Python negatives shift in ones forever; mask like the engines do
    xm, ym = x & INPUT_MASK, y & INPUT_MASK
    want = 0
    for i in range(31):
        want |= ((xm >> i) & 1) << (2 * i)
        want |= ((ym >> i) & 1) << (2 * i + 1)
    assert z == want
    assert 0 <= z < 2**62


@given(st.lists(st.tuples(_i64, _i64), min_size=1, max_size=40))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_morton_spark_duckdb_model_agree(spark, pairs) -> None:
    """Real-engine parity on adversarial inputs: Spark expression ==
    DuckDB twin == Python model, bit for bit, for every pair."""
    pdf = pd.DataFrame(pairs, columns=["x", "y"]).astype("int64")
    want = [_morton_model(x, y) for x, y in pairs]

    from pyspark.sql import functions as F

    got_spark = [
        r["z"]
        for r in spark.createDataFrame(pdf)
        .select(morton_interleave(F.col("x"), F.col("y")).alias("z"))
        .collect()
    ]
    assert got_spark == want

    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {morton_interleave_sql('x', 'y')} FROM t"
        ).fetchall()
    ]
    assert got_duck == want


def test_morton_null_propagates_both_engines(spark) -> None:
    """NULL in either key -> NULL z on both engines (never a silent
    zero, which would cluster every null row at the curve origin)."""
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {"x": [1, None, None], "y": [None, 2, None]}, dtype="Int64"
    )
    got = (
        spark.createDataFrame(pdf)
        .select(morton_interleave(F.col("x"), F.col("y")).alias("z"))
        .collect()
    )
    assert [r["z"] for r in got] == [None, None, None]

    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = con.execute(
        f"SELECT {morton_interleave_sql('x', 'y')} FROM t"
    ).fetchall()
    assert [r[0] for r in got_duck] == [None, None, None]


# spans up to the documented 2^55 exactness bound, offsets inside them
_span_case = st.integers(min_value=0, max_value=2**55 - 1).flatmap(
    lambda span: st.tuples(
        st.just(span),
        st.integers(min_value=0, max_value=span),
        st.integers(min_value=-(2**60), max_value=2**60),
    )
)


@given(st.lists(_span_case, min_size=1, max_size=40))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_range_bucket_exact_and_bounded(spark, cases) -> None:
    """range_bucket == exact integer ``offset * 2^bits // (span+1)``
    (the double-division trick must never drift off the true quotient
    below the 2^55 span bound), stays in [0, 2^bits), and is monotone
    in the offset."""
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        [
            {"mn": base, "mx": base + span, "v": base + off}
            for span, off, base in cases
        ],
        dtype="int64",
    )
    want = [
        (int(r.v) - int(r.mn)) * (1 << BUCKET_BITS) // (int(r.mx) - int(r.mn) + 1)
        for r in pdf.itertuples()
    ]
    got = [
        r["b"]
        for r in spark.createDataFrame(pdf)
        .select(
            range_bucket(
                F.col("v"), F.col("mn"), F.col("mx")
            ).alias("b")
        )
        .collect()
    ]
    assert got == want
    assert all(0 <= b < (1 << BUCKET_BITS) for b in got)


@given(
    st.integers(min_value=1, max_value=4).flatmap(
        lambda k: st.lists(
            st.lists(
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=k,
                max_size=k,
            ),
            min_size=1,
            max_size=20,
        )
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_morton_key_bit_placement(spark, rows) -> None:
    """k-way interleave: bucket i's bit b lands at position b*k + i,
    regardless of junk above the bucket width (masked away)."""
    from pyspark.sql import functions as F

    k = len(rows[0])
    cols = [f"c{i}" for i in range(k)]
    pdf = pd.DataFrame(rows, columns=cols, dtype="int64")

    def model(vals: list[int]) -> int:
        z = 0
        for i, v in enumerate(vals):
            v &= (1 << BUCKET_BITS) - 1
            for b in range(BUCKET_BITS):
                z |= ((v >> b) & 1) << (b * k + i)
        return z

    want = [model(list(r)) for r in rows]
    got = [
        r["z"]
        for r in spark.createDataFrame(pdf)
        .select(morton_key([F.col(c) for c in cols]).alias("z"))
        .collect()
    ]
    assert got == want
