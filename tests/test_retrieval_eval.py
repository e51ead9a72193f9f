"""Unit tests for the r11b additions: BM25 ranked retrieval,
histogram-exact binary AUC, hard-negative mining, and the PMI
collocation query's determinism contract."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from credit_card_etl_pipeline_spark.dataops import evaluate as ev
from credit_card_etl_pipeline_spark.dataops import retrieval as rt
from credit_card_etl_pipeline_spark.dataops import similarity as sim


# ------------------------------------------------------------------
# BM25
# ------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)]
    )


def test_bm25_rare_term_outranks_common(spark):
    # 'rare' appears in one doc, 'common' in all four: the rare-term
    # doc must outrank docs matching only the common term.
    docs = _docs(
        spark,
        [
            "common rare pad pad",
            "common pad pad pad",
            "common pad pad pad",
            "common pad pad pad",
        ],
    )
    out = rt.bm25_topk(docs, ["rare", "common"], k=4).collect()
    assert out[0]["doc_id"] == 0
    assert out[0]["n_terms"] == 2
    assert all(r["score_x1e9"] < out[0]["score_x1e9"] for r in out[1:])


def test_bm25_tf_saturates(spark):
    # Doubling tf must increase the score sublinearly (k1 saturation):
    # score(tf=8) < 2 * score(tf=4) for same-length docs.
    docs = _docs(
        spark,
        [
            "t t t t x x x x",          # tf=4, dl=8
            "t t t t t t t t",          # tf=8, dl=8
            "x x x x x x x x",          # keeps df/avgdl stable
        ],
    )
    rows = {r["doc_id"]: r["score_x1e9"] for r in
            rt.bm25_topk(docs, ["t"], k=3).collect()}
    assert rows[1] > rows[0]
    assert rows[1] < 2 * rows[0]


def test_bm25_length_damping(spark):
    # Same tf, longer doc → lower score (the b term).
    docs = _docs(
        spark,
        [
            "t t pad pad",
            "t t pad pad pad pad pad pad pad pad pad pad",
        ],
    )
    rows = {r["doc_id"]: r["score_x1e9"] for r in
            rt.bm25_topk(docs, ["t"], k=2).collect()}
    assert rows[0] > rows[1]


def test_bm25_empty_terms_raise(spark):
    with pytest.raises(ValueError):
        rt.bm25_topk(_docs(spark, ["x"]), [])


def test_bm25_no_match_is_empty(spark):
    docs = _docs(spark, ["a b c", "d e f"])
    assert rt.bm25_topk(docs, ["zzz"], k=5).count() == 0


# ------------------------------------------------------------------
# Binary AUC
# ------------------------------------------------------------------

def _auc(spark, rows):
    df = spark.createDataFrame(
        [Row(grp=g, is_pos=p, score=s) for g, p, s in rows]
    )
    return {
        r["grp"]: (r["n_pos"], r["n_neg"], r["auc_ppm"])
        for r in ev.binary_auc_by_group(df).collect()
    }


def test_auc_perfect_separation(spark):
    out = _auc(spark, [("a", 1, 10), ("a", 1, 9), ("a", 0, 2), ("a", 0, 1)])
    assert out["a"] == (2, 2, 1_000_000)


def test_auc_perfect_inversion(spark):
    out = _auc(spark, [("a", 0, 10), ("a", 1, 1)])
    assert out["a"][2] == 0


def test_auc_all_tied_is_half(spark):
    out = _auc(spark, [("a", 1, 5), ("a", 0, 5), ("a", 1, 5), ("a", 0, 5)])
    assert out["a"][2] == 500_000


def test_auc_known_mixed_value(spark):
    # pos scores {3, 1}, neg scores {2, 0}: pairs won = 3 of 4, no
    # ties → AUC = 750000 ppm.
    out = _auc(spark, [("a", 1, 3), ("a", 1, 1), ("a", 0, 2), ("a", 0, 0)])
    assert out["a"] == (2, 2, 750_000)


def test_auc_degenerate_group_is_null(spark):
    out = _auc(spark, [("a", 1, 3), ("a", 1, 1), ("b", 1, 2), ("b", 0, 1)])
    assert out["a"][2] is None
    assert out["b"][2] == 1_000_000


def test_auc_groups_independent(spark):
    out = _auc(
        spark,
        [("a", 1, 10), ("a", 0, 1), ("b", 0, 10), ("b", 1, 1)],
    )
    assert out["a"][2] == 1_000_000
    assert out["b"][2] == 0


# ------------------------------------------------------------------
# Hard-negative mining
# ------------------------------------------------------------------

def test_hard_negatives_exclude_same_label(spark):
    rows = [
        Row(vec_id=0, label=0, vec=[1.0, 0.0]),   # anchor
        Row(vec_id=1, label=0, vec=[0.99, 0.01]),  # same label: excluded
        Row(vec_id=2, label=1, vec=[0.9, 0.1]),
        Row(vec_id=3, label=1, vec=[0.0, 1.0]),
        Row(vec_id=4, label=2, vec=[0.8, 0.2]),
    ]
    df = spark.createDataFrame(rows).select(
        "vec_id", "label", sim.quantize(F.col("vec")).alias("qvec")
    )
    anchors = df.where(F.col("vec_id") == 0)
    out = sim.hard_negative_topk(df, anchors, k=10).collect()
    got = {r["cand_id"] for r in out}
    assert got == {2, 3, 4}
    assert all(r["cand_label"] != 0 for r in out)
    # nearest different-label candidate ranks first
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert by_rank[0]["cand_id"] == 2


def test_hard_negatives_rank_is_dense_from_one(spark):
    rows = [
        Row(vec_id=i, label=i % 2, vec=[1.0, float(i) / 10]) for i in range(6)
    ]
    df = spark.createDataFrame(rows).select(
        "vec_id", "label", sim.quantize(F.col("vec")).alias("qvec")
    )
    anchors = df.where(F.col("vec_id") < 2)
    out = sim.hard_negative_topk(df, anchors, k=3)
    ranks = (
        out.groupBy("query_id")
        .agg(F.sort_array(F.collect_list("rank")).alias("rks"))
        .collect()
    )
    for r in ranks:
        assert r["rks"] == list(range(1, len(r["rks"]) + 1))


# ------------------------------------------------------------------
# PMI collocations (registered query: determinism of the LIMIT)
# ------------------------------------------------------------------

def test_pmi_query_deterministic_and_bounded(spark):
    from credit_card_etl_pipeline_spark.queries import QUERIES

    fn = QUERIES["text_pmi_collocations"]
    a = fn(spark, "/root/testdata/sf0.001").collect()
    b = fn(spark, "/root/testdata/sf0.001").collect()
    assert a == b
    assert len(a) <= 50
    assert all(r["n_xy"] >= 5 for r in a)
    # ranking is by descending ratio
    ratios = [r["pmi_ratio"] for r in a]
    assert ratios == sorted(ratios, reverse=True)


# ------------------------------------------------------------------
# RRF fusion (registered query: structure + determinism)
# ------------------------------------------------------------------

def test_rrf_fusion_properties(spark):
    from credit_card_etl_pipeline_spark.queries import QUERIES

    fn = QUERIES["ann_rrf_fusion"]
    a = fn(spark, "/root/testdata/sf0.001").collect()
    b = fn(spark, "/root/testdata/sf0.001").collect()
    assert a == b
    by_q = {}
    for r in a:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["rrf_x1e6"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        # both systems rank top-10; a candidate in both lists carries
        # n_systems == 2 and the max possible fused score is bounded
        # by 2 * 1e6/61
        assert all(1 <= r["n_systems"] <= 2 for r in rows)
        assert all(r["rrf_x1e6"] <= 2 * (1_000_000 // 61) for r in rows)
