"""Self-tuning operators added after the sf1→sf10 ladder
(LADDER_SF10_r09.json): the flat↔hierarchical semantic-dedup strategy
flip and the k ~ √n IVF sizing law.  The decision rules are pure
functions of the corpus size (so both engines and both runs agree);
these tests pin the boundaries, the parity of the auto query with
whichever specialist it picks, and that the flip actually changes the
executed branch."""

from __future__ import annotations

import duckdb

from credit_card_etl_pipeline_spark.dataops import similarity as sim
from credit_card_etl_pipeline_spark.queries import dataops_queries as dq

from conftest import SF_SMOKE


def test_choose_semantic_strategy_boundaries():
    # measured flip (SOAK_SEMANTIC_FLIP_r09.json): flat ties the
    # occupancy-scaled two-level at 2.2M and loses at 6.6M → 3M pin
    assert sim.SEMANTIC_FLIP_AT == 3_000_000
    for n in (0, 24_200, 220_000, 2_200_000):
        assert sim.choose_semantic_strategy(n) == "flat"
    for n in (3_000_000, 6_600_000, 10**9):
        assert sim.choose_semantic_strategy(n) == "two_level"
    # the fixed-depth hierarchy lost every soaked point — never chosen
    assert sim.choose_semantic_strategy(9, flip_at=10) == "flat"
    assert sim.choose_semantic_strategy(10, flip_at=10) == "two_level"
    assert sim.choose_semantic_strategy(100, flip_at=None) == "flat"


def test_ivf_auto_k_matches_oracle_formula():
    assert sim.ivf_auto_k(0) == 8
    assert sim.ivf_auto_k(63) == 8  # floor(sqrt(63)) = 7 < floor_k
    assert sim.ivf_auto_k(64) == 8
    assert sim.ivf_auto_k(500) == 22
    assert sim.ivf_auto_k(200_000) == 447
    # identical to the DuckDB expression embedded in the auto oracle,
    # over a range that crosses perfect squares (the floor hazard)
    for n in list(range(1, 300)) + [4095, 4096, 4097, 999_999, 10**6]:
        (dk,) = duckdb.sql(
            f"SELECT greatest(8, CAST(floor(sqrt({n}*1.0)) AS BIGINT))"
        ).fetchone()
        assert sim.ivf_auto_k(n) == dk, n


def test_ivf_auto_nprobe_matches_oracle_formula():
    assert sim.ivf_auto_nprobe(8) == 2
    assert sim.ivf_auto_nprobe(44) == 6
    assert sim.ivf_auto_nprobe(447) == 21
    for k in list(range(1, 200)) + [4096, 4097]:
        (dp,) = duckdb.sql(
            f"SELECT greatest(2, CAST(floor(sqrt({k}*1.0)) AS BIGINT))"
        ).fetchone()
        assert sim.ivf_auto_nprobe(k) == dp, k


def _verdicts(df):
    return {
        (r["vec_id"], r["is_semantic_dup"])
        for r in df.select("vec_id", "is_semantic_dup").collect()
    }


def test_semantic_auto_picks_flat_and_matches_specialist(spark):
    auto = dq.dedup_semantic_auto(spark, SF_SMOKE)
    assert auto.columns == ["vec_id", "is_semantic_dup", "strategy"]
    rows = auto.collect()
    assert rows and all(r["strategy"] == "flat" for r in rows)
    flat = dq.dedup_semantic_clusters(spark, SF_SMOKE)
    assert {(r["vec_id"], r["is_semantic_dup"]) for r in rows} == _verdicts(
        flat
    )


def test_semantic_auto_flip_executes_two_level_branch(spark):
    # force the flip on the smoke corpus: same stable schema, and the
    # verdicts are the two-level specialist's, not the flat ones
    auto = dq.dedup_semantic_auto(spark, SF_SMOKE, flip_at=10)
    assert auto.columns == ["vec_id", "is_semantic_dup", "strategy"]
    rows = auto.collect()
    assert rows and all(r["strategy"] == "two_level" for r in rows)
    two = dq.dedup_semantic_two_level(spark, SF_SMOKE)
    assert {(r["vec_id"], r["is_semantic_dup"]) for r in rows} == _verdicts(
        two
    )


def test_ann_ivf_auto_k_sizes_codebook_from_corpus(spark):
    out = dq.ann_ivf_auto_k(spark, SF_SMOKE)
    assert out.columns == ["query_id", "cand_id", "cosine", "rank"]
    rows = out.collect()
    assert rows and all(1 <= r["rank"] <= 5 for r in rows)
    # the codebook actually fit at the √n size, not the fixed floor
    n = dq._EMB_COUNT_CACHE[SF_SMOKE]
    k = sim.ivf_auto_k(n)
    assert k > dq._IVF_K  # 500 smoke vectors → k=22
    assert len(dq._IVF_CODEBOOK_CACHE[(SF_SMOKE, k, dq._IVF_ITERS)]) == k


def test_semantic_two_level_k_matches_oracle_formula():
    assert sim.semantic_two_level_k(0) == 2
    assert sim.semantic_two_level_k(550) == 2
    assert sim.semantic_two_level_k(24_200) == 5
    assert sim.semantic_two_level_k(242_000) == 16
    assert sim.semantic_two_level_k(2_420_000) == 50
    for n in [1, 999, 1000, 1001, 4000, 4001, 24_200, 10**6, 10**6 + 1]:
        (dk,) = duckdb.sql(
            f"SELECT greatest(2, CAST(ceil(sqrt({n} / 1000.0)) AS BIGINT))"
        ).fetchone()
        assert sim.semantic_two_level_k(n) == dk, n


def test_two_level_occupancy_and_verdicts(spark):
    out = dq.dedup_semantic_two_level(spark, SF_SMOKE)
    assert out.columns == ["vec_id", "cell", "subcell", "is_semantic_dup"]
    rows = out.collect()
    n = len(rows)
    assert n > 0
    # every injected exact duplicate (vec_id >= 1_000_000 copies a
    # base vector) must be flagged — the keep-lowest-id guarantee
    injected = [r for r in rows if r["vec_id"] >= 1_000_000]
    assert injected and all(r["is_semantic_dup"] for r in injected)
    # both levels bounded by the sizing law
    k = sim.semantic_two_level_k(n)
    assert all(0 <= r["cell"] < k and 0 <= r["subcell"] < k for r in rows)
