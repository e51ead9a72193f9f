"""Dataops unit tests: multimodal decode plumbing (Arrow batch path),
LSH recall sanity vs the exact scorer, and dedup survivor semantics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from credit_card_etl_pipeline_spark.dataops.dedup import dedup_exact
from credit_card_etl_pipeline_spark.dataops.multimodal import (
    decode_media,
    media_metadata,
    pack_text_as_media,
)
from credit_card_etl_pipeline_spark.dataops import similarity as sim
from credit_card_etl_pipeline_spark.dataops.similarity import (
    ann_lsh_topk,
    cosine_topk,
    quantize,
)


def test_multimodal_fake_decode_batch_path(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["abcd", "zz"]})
    df = spark.createDataFrame(pdf).select(
        "doc_id", pack_text_as_media(F.col("text")).alias("payload")
    )
    out = {r["doc_id"]: r for r in decode_media(df, fake=True).collect()}
    assert out[1]["n_bytes"] == 4
    assert sum(out[1]["feature"]) == 4  # histogram mass == byte count
    assert out[2]["n_bytes"] == 2
    # 'z' = 0x7a → high nibble 7
    assert out[2]["feature"][7] == 2


def test_multimodal_real_decode_is_stubbed(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]})).select(
        "doc_id", pack_text_as_media(F.col("text")).alias("payload")
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_media(df, fake=False).collect()


def test_multimodal_resize_and_frame_sample(spark):
    from credit_card_etl_pipeline_spark.dataops.multimodal import (
        resize_images,
        sample_frames,
    )

    pdf = pd.DataFrame({"doc_id": [1], "text": ["x" * 100]})
    df = spark.createDataFrame(pdf).select(
        "doc_id", pack_text_as_media(F.col("text")).alias("payload")
    )
    r = resize_images(df, width=4, height=4, fake=True).collect()[0]
    assert (r["width"], r["height"]) == (4, 4)
    assert len(r["pixels"]) == 16

    frames = sample_frames(df, frame_bytes=10, every=3, fake=True).collect()
    # 100 bytes → 10 frames → kept frames 0,3,6,9
    assert [f["frame_no"] for f in frames] == [0, 3, 6, 9]
    assert all(len(f["frame"]) == 10 for f in frames)


def test_media_metadata_struct(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["hello"]}))
    row = df.select(
        media_metadata(pack_text_as_media(F.col("t")), "image", "utf8").alias("m")
    ).collect()[0]["m"]
    assert row["byte_len"] == 5
    assert row["media_type"] == "image"
    assert len(row["checksum"]) == 32


def test_ann_lsh_is_subset_quality(spark):
    # LSH results must be a subset of the exact candidate scores: every
    # (query, cand, cosine) it returns appears in the exact brute-force
    # scoring with the same cosine.
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.select(
        "vec_id", quantize(F.col("embedding")).alias("qvec")
    )
    queries = q.where(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["cand_id"]): r["cosine"]
        for r in cosine_topk(q, queries, k=39).collect()
    }
    approx = ann_lsh_topk(q, queries, k=5, n_planes=4, dim=8).collect()
    assert approx  # buckets collide at least somewhere
    for r in approx:
        assert exact[(r["query_id"], r["cand_id"])] == pytest.approx(
            r["cosine"], abs=0
        )


def test_ivf_subset_quality_and_determinism(spark):
    import numpy as np

    from credit_card_etl_pipeline_spark.dataops.similarity import (
        ivf_fit,
        ivf_topk,
    )

    rng = np.random.RandomState(11)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.select("vec_id", quantize(F.col("embedding")).alias("qvec"))
    queries = q.where(F.col("vec_id") % 15 == 0)

    centroids = ivf_fit(q, k=4, iters=2)
    assert len(centroids) == 4 and len(centroids[0]) == 8
    # deterministic: refit yields the identical codebook
    assert ivf_fit(q, k=4, iters=2) == centroids

    exact = {
        (r["query_id"], r["cand_id"]): r["cosine"]
        for r in cosine_topk(q, queries, k=59).collect()
    }
    approx = ivf_topk(q, queries, centroids, k=5, nprobe=2).collect()
    assert approx
    for r in approx:
        # every returned score equals the exact scorer's value
        assert exact[(r["query_id"], r["cand_id"])] == r["cosine"]


def test_lsh_hot_bucket_cap(spark):
    from credit_card_etl_pipeline_spark.dataops.dedup import (
        exploded_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    # 5 identical docs (one hot bucket) + 2 distinct ones
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(7)),
            "text": ["same boilerplate text here"] * 5
            + ["alpha beta gamma delta", "one two three four"],
        }
    )
    sig = minhash_signatures(exploded_shingles(spark.createDataFrame(pdf)))
    uncapped = lsh_candidate_pairs(
        sig, bands=2, rows=4, max_bucket_size=None
    ).count()
    capped = lsh_candidate_pairs(sig, bands=2, rows=4, max_bucket_size=3).count()
    assert uncapped == 10  # C(5,2) from the hot bucket
    assert capped == 0     # hot bucket dropped, distinct docs collide nowhere

    from credit_card_etl_pipeline_spark.dataops.dedup import lsh_overflow_docs

    # the capped-out docs surface through the overflow companion, so a
    # caller can route them through exact dedup
    overflow = sorted(
        r["doc_id"]
        for r in lsh_overflow_docs(sig, bands=2, rows=4, max_bucket_size=3).collect()
    )
    assert overflow == [0, 1, 2, 3, 4]


def test_jaccard_for_pairs_materialized_flag_is_result_neutral(spark):
    """shingles_materialized=True must only skip the internal
    localCheckpoint — same rows either way, including the zero-overlap
    pair (n_inter fill path) and the partial-overlap pair."""
    from credit_card_etl_pipeline_spark.dataops.dedup import (
        exploded_shingles,
        jaccard_for_pairs,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon",
                "alpha beta gamma zeta eta",
                "one two three four five",
                "totally different words entirely here",
            ],
        }
    )
    sh = exploded_shingles(spark.createDataFrame(pdf))
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [0, 2], "doc_b": [1, 3]})
    )
    plain = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_for_pairs(sh, pairs).collect()
    }
    pre = sh.localCheckpoint(eager=True)
    mat = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_for_pairs(
            pre, pairs, shingles_materialized=True
        ).collect()
    }
    assert plain == mat
    assert plain[(2, 3)] == 0.0  # zero-overlap fill path exercised


def test_connected_components_chain_and_isolates(spark):
    from credit_card_etl_pipeline_spark.dataops.dedup import (
        connected_components,
    )

    vertices = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long"
    )
    # chain 0-1-2-3 (diameter > 1 → needs propagation rounds),
    # pair 5-6, isolates 4 and 7
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    out = {
        r["doc_id"]: r["component"]
        for r in connected_components(vertices, edges).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7}


def test_connected_components_fast_path_matches_distributed(spark):
    """The guarded driver union-find (edge count <= cap) and the
    distributed min-label propagation (cap forced to None) must label
    identically: component = min reachable id, isolates = own id."""
    import random

    from credit_card_etl_pipeline_spark.dataops.dedup import (
        connected_components,
    )

    rng = random.Random(7)
    n = 200
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(120)
            )
            if a != b
        }
    )
    # adversarial extras: a long chain (deep diameter) and a star
    edges += [(100 + i, 101 + i) for i in range(20)]
    edges += [(0, 150 + i) for i in range(10)]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edf = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {
        r["doc_id"]: r["component"]
        for r in connected_components(vertices, edf).collect()
    }
    dist = {
        r["doc_id"]: r["component"]
        for r in connected_components(
            vertices, edf, driver_edge_cap=None
        ).collect()
    }
    assert fast == dist
    # spot-check the min-id invariant on the star
    assert fast[150] == 0


def test_connected_components_refuses_partial_convergence(spark):
    """Both strategies return exactly converged labels or fail loudly:
    a diameter-5 chain with max_iters=2 must RAISE on the distributed
    path (never silently return partially-propagated labels), while
    the driver union-find converges fully regardless of the bound."""
    from credit_card_etl_pipeline_spark.dataops.dedup import (
        connected_components,
    )

    vertices = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            vertices, edges, max_iters=2, driver_edge_cap=None
        )
    # zero rounds can only mean unpropagated labels — rejected up front
    with pytest.raises(ValueError, match="max_iters"):
        connected_components(
            vertices, edges, max_iters=0, driver_edge_cap=None
        )
    out = {
        r["doc_id"]: r["component"]
        for r in connected_components(vertices, edges, max_iters=2).collect()
    }
    assert out == {i: 0 for i in range(6)}


def test_connected_components_empty_edges(spark):
    from credit_card_etl_pipeline_spark.dataops.dedup import (
        connected_components,
    )

    vertices = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {
        r["doc_id"]: r["component"]
        for r in connected_components(vertices, edges).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


def test_duplicate_spans_detection_and_merging(spark):
    """Cross-doc repeats, self-repeats, and overlap merging of the
    sliding-window span dedup (k=8): a repeated 8-token run marks one
    exact span per occurrence; a repeated 9-token run produces two
    overlapping marked windows that must merge into ONE maximal span;
    non-adjacent repeats within a doc stay separate spans."""
    from credit_card_etl_pipeline_spark.dataops.dedup import duplicate_spans

    run8 = "a b c d e f g h"
    run9 = "m1 m2 m3 m4 m5 m6 m7 m8 m9"
    docs = [
        (1, "p1 p2 " + run8 + " q1 q2"),  # run8 at pos 3..10
        (2, "r1 r2 r3 r4 " + run8),       # run8 at pos 5..12
        (3, run8 + " gap " + run8),       # self-repeat: pos 1..8, 10..17
        (4, run9),                        # overlapping windows merge
        (5, "z " + run9),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_spans(df, k=8).collect()
    }
    assert out == {
        (1, 3, 10, 8),
        (2, 5, 12, 8),
        (3, 1, 8, 8),
        (3, 10, 17, 8),
        (4, 1, 9, 9),
        (5, 2, 10, 9),
    }


def test_dedup_exact_survivors(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["Hello  World", "hello world", "unique doc", "HELLO WORLD"],
        }
    )
    out = dedup_exact(spark.createDataFrame(pdf))
    # normalization folds case+whitespace → docs 1,2,4 are one group
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_cms_estimate_upper_bounds_truth(spark):
    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.dataops import sketches as sk

    df = spark.createDataFrame(
        [(i % 37,) for i in range(2000)], "k long"
    )
    sketch = sk.cms_build(df, "k")
    probes = df.distinct()
    est = {r["k"]: r["cms_estimate"] for r in sk.cms_estimate(sketch, probes, "k").collect()}
    truth = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(truth)
    # count-min never underestimates
    assert all(est[k] >= truth[k] for k in truth)
    # with 37 keys in 4x256 cells, most estimates should be exact
    exact = sum(1 for k in truth if est[k] == truth[k])
    assert exact >= 30


def test_iter_sampled_frames_matches_dataframe_operator(spark):
    """The extracted per-payload helper must emit exactly the rows the
    sample_frames DataFrame operator emits, for both the fake path and
    a real GIF payload (it IS the operator's decode routing — the
    fused queries rely on that equivalence)."""
    from credit_card_etl_pipeline_spark.dataops import gif as gifc
    from credit_card_etl_pipeline_spark.dataops import multimodal as mm

    frames = [bytes((f * 29 + i * 5) % 256 for i in range(64)) for f in range(6)]
    gif_payload = gifc.encode_gif(8, 8, frames)
    fake_payload = bytes(range(128))
    for payload, fake in ((gif_payload, False), (fake_payload, True)):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [7], "payload": [payload]})
        )
        via_op = sorted(
            (r["frame_no"], bytes(r["frame"]))
            for r in mm.sample_frames(df, every=4, fake=fake).collect()
        )
        via_helper = sorted(
            (fno, bytes(fr))
            for fno, fr in mm.iter_sampled_frames(
                payload, every=4, fake=fake
            )
        )
        assert via_op == via_helper
        assert via_helper  # non-vacuous: at least one sampled frame


def test_audio_stats_of_matches_dataframe_operator(spark):
    """The extracted per-payload audio-stats helper must return exactly
    what decode_audio_stats emits (the operator calls it — pin the
    contract anyway so a drift in either layer fails loudly)."""
    from credit_card_etl_pipeline_spark.dataops import multimodal as mm
    from credit_card_etl_pipeline_spark.dataops import wav as wavc

    samples = [((i * 7) % 2048) - 1024 for i in range(256)]
    payload = wavc.encode_wav(16000, samples)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3], "payload": [payload]})
    )
    row = mm.decode_audio_stats(df).collect()[0]
    rate, n, peak, tot = mm.audio_stats_of(payload)
    assert (
        row["sample_rate"],
        row["n_samples"],
        row["peak_abs"],
        row["sum_abs"],
    ) == (rate, n, peak, tot)
    assert n == 256 and rate == 16000


def test_cms_build_weighted_matches_raw(spark):
    """cms_build(weight_col=...) over exact (key, count) rows must
    produce the cell-identical sketch the raw-row build produces —
    the equivalence the one-pass sketch queries rely on."""
    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.dataops import sketches as sk

    raw = spark.createDataFrame(
        [(i % 23,) for i in range(1500)], "k long"
    )
    counts = raw.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    cells_raw = {
        (r["j"], r["bucket"]): r["counter"]
        for r in sk.cms_build(raw, "k").collect()
    }
    cells_w = {
        (r["j"], r["bucket"]): r["counter"]
        for r in sk.cms_build(counts, "k", weight_col="n").collect()
    }
    assert cells_raw == cells_w


def test_substring_containment_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox"),          # token-aligned substring of 1
            (3, "Quick  Brown   FOX"),       # same after normalization
            (4, "own fox jumps"),            # char-substring but NOT token-aligned
            (5, "ick brown fox"),            # NOT token-aligned ('ick' != 'quick')
            (6, "lazy cat"),                 # <3 tokens: out of scope
            (7, "totally unrelated words here"),
        ],
        "doc_id long, text string",
    )
    from credit_card_etl_pipeline_spark.dataops.dedup import (
        substring_containment,
    )
    pairs = {
        (r["contained_id"], r["container_id"])
        for r in substring_containment(docs).collect()
    }
    # 2 and 3 normalize identically -> contained in 1 and in each other
    assert pairs == {(2, 1), (3, 1), (2, 3), (3, 2)}


def test_substring_containment_anchor_cap(spark):
    # Anchor 'a b c' occurs in every doc; cap 2 drops it corpus-wide.
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c"),
            (3, "x a b c d y"),
        ],
        "doc_id long, text string",
    )
    from credit_card_etl_pipeline_spark.dataops.dedup import (
        substring_containment,
    )
    uncapped = {
        (r["contained_id"], r["container_id"])
        for r in substring_containment(docs, max_anchor_bucket=None).collect()
    }
    assert uncapped == {(1, 3), (2, 1), (2, 3)}
    capped = substring_containment(docs, max_anchor_bucket=2).collect()
    assert capped == []


def test_substring_containment_hot_last_shingle_survives_cap(spark):
    # r11 optimization guard: the last-shingle candidate gate must
    # probe the UNCAPPED shingle table.  Contained doc 1's FIRST
    # trigram 'u1 u2 u3' is unique (anchor survives cap=2) but its
    # LAST trigram 'h1 h2 h3' appears in 4 docs (over the cap) — a
    # gate that consulted the capped table would lose the true pair.
    docs = spark.createDataFrame(
        [
            (1, "u1 u2 u3 h1 h2 h3"),
            (2, "pre u1 u2 u3 h1 h2 h3 post"),   # contains 1
            (3, "other words then h1 h2 h3"),    # hot-tail filler
            (4, "more filler ending h1 h2 h3"),  # hot-tail filler
        ],
        "doc_id long, text string",
    )
    from credit_card_etl_pipeline_spark.dataops.dedup import (
        substring_containment,
    )
    pairs = {
        (r["contained_id"], r["container_id"])
        for r in substring_containment(docs, max_anchor_bucket=2).collect()
    }
    assert (1, 2) in pairs


def test_bloom_no_false_negatives_and_mergeable(spark):
    from credit_card_etl_pipeline_spark.dataops.sketches import (
        bloom_build,
        bloom_probe,
    )

    a = spark.range(0, 50).selectExpr("id AS k")
    b = spark.range(50, 100).selectExpr("id AS k")
    bloom_a = bloom_build(a, "k")
    # every inserted key must be claimed (structural: no false negatives)
    claimed = bloom_probe(bloom_a, a, "k")
    assert claimed.where("NOT bloom_member").count() == 0
    # merge by union-distinct == build over the union
    merged = bloom_a.unionByName(bloom_build(b, "k")).distinct()
    direct = bloom_build(a.unionByName(b), "k")
    sym_diff = merged.exceptAll(direct).count() + direct.exceptAll(merged).count()
    assert sym_diff == 0
    # the filter is bounded by its bit space
    assert merged.count() <= 1024


def test_lsh_probe_pairs_asymmetric_and_capped(spark):
    from credit_card_etl_pipeline_spark.dataops.dedup import (
        exploded_shingles,
        lsh_probe_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),   # dup of 1
            (3, "one two three four five six"),
            (101, "alpha beta gamma delta epsilon"), # new: dup of 1/2
            (102, "totally different text entirely here"),
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(exploded_shingles(docs))
    new = sigs.where("doc_id >= 100")
    old = sigs.where("doc_id < 100")
    pairs = {
        (r["new_id"], r["corpus_id"])
        for r in lsh_probe_pairs(new, old, max_bucket_size=None).collect()
    }
    # asymmetric: only new x corpus, never corpus x corpus or new x new
    assert pairs == {(101, 1), (101, 2)}
    # corpus-side cap: bucket holding docs 1 and 2 overflows at cap 1
    capped = lsh_probe_pairs(new, old, max_bucket_size=1).collect()
    assert capped == []


def test_pq_codes_and_adc_ranking(spark):
    import numpy as np

    from credit_card_etl_pipeline_spark.dataops.similarity import (
        ann_pq_topk,
        pq_fit,
        pq_codes,
    )

    rng = np.random.RandomState(13)
    # two tight clusters far apart in 8-dim space: ADC must rank
    # same-cluster candidates above cross-cluster ones even through
    # the code compression
    base_a = rng.randn(8) * 0.1 + 5.0
    base_b = rng.randn(8) * 0.1 - 5.0
    vecs = [(i, [float(x) for x in base_a + rng.randn(8) * 0.05]) for i in range(20)]
    vecs += [(i, [float(x) for x in base_b + rng.randn(8) * 0.05]) for i in range(20, 40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.select("vec_id", quantize(F.col("embedding")).alias("qvec"))

    books = pq_fit(q, m=2, k=4, iters=2, dim=8)
    assert len(books) == 2 and len(books[0]) == 4 and len(books[0][0]) == 4
    # deterministic refit
    assert pq_fit(q, m=2, k=4, iters=2, dim=8) == books

    codes = q.select(
        "vec_id", *[c.alias(f"c{s}") for s, c in enumerate(pq_codes(F.col("qvec"), books, dim=8))]
    ).collect()
    for r in codes:
        assert 0 <= r["c0"] < 4 and 0 <= r["c1"] < 4

    queries = q.where(F.col("vec_id").isin([0, 25]))
    top = ann_pq_topk(q, queries, books, k=5, dim=8).collect()
    assert top
    for r in top:
        same_cluster = (r["query_id"] < 20) == (r["cand_id"] < 20)
        assert same_cluster, (r["query_id"], r["cand_id"])


def test_pq_fit_rejects_ragged_split(spark):
    import pytest as _pytest

    from credit_card_etl_pipeline_spark.dataops.similarity import pq_fit

    df = spark.createDataFrame(
        [(1, [1.0] * 6)], "vec_id long, qvec array<double>"
    )
    with _pytest.raises(ValueError):
        pq_fit(df, m=4, dim=6)


def test_pagerank_integer_exact_and_hub_ranks_highest(spark):
    from credit_card_etl_pipeline_spark.dataops.graph import (
        RANK_BASE,
        pagerank,
    )

    # star graph: everyone points at node 0
    edges = spark.createDataFrame(
        [(i, 0, 1) for i in range(1, 6)], "src long, dst long, w long"
    )
    out = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}
    assert set(out) == set(range(6))
    assert out[0] == max(out.values())
    # spokes get pure teleport after round 1 (no in-edges)
    teleport = (3 * RANK_BASE) // 20
    for i in range(1, 6):
        assert out[i] == teleport
    # deterministic under repartitioning (integer arithmetic only)
    out2 = {
        r.node: r.rank
        for r in pagerank(edges.repartition(7), iters=3).collect()
    }
    assert out2 == out


def test_damerau_levenshtein_matches_duckdb_variant():
    import random

    import duckdb

    from credit_card_etl_pipeline_spark.queries.dataops_queries import (
        _damerau_levenshtein,
    )

    rng = random.Random(5)
    for _ in range(300):
        a = "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 14)))
        want = duckdb.sql(
            f"select damerau_levenshtein('{a}','{b}')"
        ).fetchone()[0]
        assert _damerau_levenshtein(a, b) == want, (a, b)
    # the transposition-then-edit case that separates full DL from OSA
    assert _damerau_levenshtein("ca", "abc") == 2


def test_triangle_counts_known_graph(spark):
    from credit_card_etl_pipeline_spark.dataops.graph import (
        triangle_counts,
    )

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant
    # edge 4-5 (no triangles) and a duplicate/reversed edge noise
    edges = spark.createDataFrame(
        [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (4, 5), (2, 1), (3, 2),
        ],
        "src long, dst long",
    )
    out = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # total = sum/3
    assert sum(out.values()) // 3 == 4


def test_shortest_paths_known_graph(spark):
    from credit_card_etl_pipeline_spark.dataops.graph import shortest_paths

    # line 1→2→3→4 (cost 10 each) with an expensive shortcut 1→4 (35)
    # and an unreachable island 9→10
    edges = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 10), (3, 4, 10), (1, 4, 35), (9, 10, 10)],
        "src long, dst long, cost long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.dist for r in shortest_paths(edges, seeds, iters=4).collect()
    }
    # 3 hops beat the direct edge; the island never appears
    assert got == {1: 0, 2: 10, 3: 20, 4: 30}

    # hop bound binds: with 2 rounds node 4 is only reachable via the
    # shortcut (1 hop, cost 35), not the cheaper 3-hop chain
    got2 = {
        r.node: r.dist for r in shortest_paths(edges, seeds, iters=2).collect()
    }
    assert got2[4] == 35

    # duplicate seed rows must not multiply dist rows (the operator
    # dedups seeds itself; callers aren't required to — ADVICE r5)
    dup_seeds = spark.createDataFrame([(1,), (1,), (1,)], "node long")
    rows = shortest_paths(edges, dup_seeds, iters=4).collect()
    assert len(rows) == len({r.node for r in rows})
    assert {r.node: r.dist for r in rows} == got


def test_shortest_paths_partition_invariant(spark):
    from credit_card_etl_pipeline_spark.dataops.graph import shortest_paths

    edges = spark.createDataFrame(
        [(i, i + 1, (i % 3) + 1) for i in range(20)]
        + [(0, 10, 100), (5, 15, 1)],
        "src long, dst long, cost long",
    )
    seeds = spark.createDataFrame([(0,), (5,)], "node long")
    a = sorted(
        (r.node, r.dist)
        for r in shortest_paths(edges, seeds, iters=5).collect()
    )
    b = sorted(
        (r.node, r.dist)
        for r in shortest_paths(
            edges.repartition(7), seeds.repartition(3), iters=5
        ).collect()
    )
    assert a == b


def test_prefix_filter_blocking_is_exact(spark, sf_dir):
    """The prefix-filtering bound must lose NOTHING: the prefix-blocked
    fuzzy link returns exactly the full-blocking link's matches."""
    import credit_card_etl_pipeline_spark.queries as q

    full = sorted(
        map(tuple, q.QUERIES["parts_fuzzy_link"](spark, sf_dir).collect())
    )
    pref = sorted(
        map(
            tuple,
            q.QUERIES["parts_fuzzy_link_prefix"](spark, sf_dir).collect(),
        )
    )
    assert full == pref


def test_sub_fit_small_cells_and_empty_subcells(spark):
    """Hierarchical sub-fit edges: a cell with fewer members than
    k_sub gets only that many sub-centroids; a sub-cell that loses all
    members keeps its previous centroid; assignment carries all input
    columns and emits exactly one row per vector."""
    from credit_card_etl_pipeline_spark.dataops.similarity import (
        CENTROID_GRID,
        assign_subcells,
        sub_fit,
    )

    # cell 0: 6 members around two poles; cell 1: a single member
    rows = [
        (1, [10, 0], 0), (2, [11, 0], 0), (3, [10, 1], 0),
        (4, [0, 10], 0), (5, [0, 11], 0), (6, [1, 10], 0),
        (7, [5, 5], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, qvec array<long>, cell long")
    book = sub_fit(df, k_sub=3, iters=2)
    cells = {}
    for c, s, _ in book:
        cells.setdefault(c, []).append(s)
    assert sorted(cells[0]) == [0, 1, 2]
    assert sorted(cells[1]) == [0]  # one member -> one sub-centroid

    leaves = assign_subcells(df, book)
    got = {r["vec_id"]: (r["cell"], r["subcell"]) for r in leaves.collect()}
    assert len(got) == 7  # exactly one leaf per vector
    # the two poles in cell 0 must land in different sub-cells
    assert got[1][1] == got[2][1] == got[3][1]
    assert got[4][1] == got[5][1] == got[6][1]
    assert got[1][1] != got[4][1]
    assert got[7] == (1, 0)

    # centroid values live on the binary grid (exact arithmetic)
    for _, _, c in book:
        for x in c:
            assert (x * CENTROID_GRID) == int(x * CENTROID_GRID)


def test_pack_bits64_matches_python_popcount(spark):
    # Known bit patterns, including bit 63 (the LONG_MIN special case):
    # quantized value > 0 sets the bit.
    pats = [
        [1 if (p >> i) & 1 else -1 for i in range(64)]
        for p in [0, 1, (1 << 63), (1 << 63) | 5, (1 << 64) - 1, 0xDEADBEEF]
    ]
    df = spark.createDataFrame(
        [(i, [v * 7 for v in pat]) for i, pat in enumerate(pats)],
        "vec_id long, qvec array<long>",
    )
    rows = df.select(
        "vec_id",
        sim.pack_bits64(sim.sign_bits(F.col("qvec"))).alias("w"),
    ).collect()
    got = {r.vec_id: r.w for r in rows}
    for i, pat in enumerate(pats):
        expected = sum(1 << j for j, b in enumerate(pat) if b > 0)
        if expected >= 1 << 63:  # two's complement
            expected -= 1 << 64
        assert got[i] == expected, i


def test_ann_hamming_topk_prefers_sign_matches(spark):
    # query q; candidate c1 flips 1 sign, c2 flips 20 — coarse Hamming
    # must rank c1 first and the exact rescoring keep it.
    base = [100 + 10 * i for i in range(64)]
    c1 = list(base); c1[0] = -c1[0]
    c2 = list(base)
    for i in range(20):
        c2[i] = -c2[i]
    df = spark.createDataFrame(
        [(0, [float(x) / 1000 for x in base]),
         (1, [float(x) / 1000 for x in c1]),
         (2, [float(x) / 1000 for x in c2])],
        "vec_id long, embedding array<double>",
    )
    vecs = df.select(
        "vec_id", sim.quantize(F.col("embedding")).alias("qvec")
    )
    out = sim.ann_hamming_topk(
        vecs, vecs.where(F.col("vec_id") == 0), k=2, m=2
    ).collect()
    by_rank = {r.rank: r for r in out}
    assert by_rank[1].cand_id == 1 and by_rank[1].hamming == 1
    assert by_rank[2].cand_id == 2 and by_rank[2].hamming == 20
    assert by_rank[1].cosine > by_rank[2].cosine


def test_centroid_outlier_flags_planted_outlier(spark):
    # label 0: nine identical vectors + one far outlier; label 1: all
    # identical (no outliers — d2 = 0 for every member).
    rows = [(i, 0, [0, 0, 0, 0]) for i in range(9)]
    rows.append((9, 0, [1000, 1000, 1000, 1000]))
    rows += [(10 + i, 1, [500, -500, 0, 250]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, label int, qvec array<long>")
    out = {r.vec_id: r for r in sim.centroid_outlier_verdicts(df).collect()}
    assert out[9].is_outlier is True
    assert all(not out[i].is_outlier for i in range(9))
    assert all(not out[10 + i].is_outlier for i in range(4))
    # centroid of label 0 = 100 per dim (truncating mean)
    assert out[0].d2 == 4 * 100 * 100
    assert out[9].d2 == 4 * 900 * 900
    assert out[9].n_members == 10


def test_leakage_safe_split_coassigns_planted_duplicates(spark, sf_dir):
    from credit_card_etl_pipeline_spark import queries as q

    split = q.QUERIES["documents_leakage_safe_split"](spark, sf_dir)
    dup = split.where(F.col("doc_id") >= 1_000_000).select(
        (F.col("doc_id") - 1_000_000).alias("doc_id"),
        F.col("split").alias("dup_split"),
    )
    joined = split.join(dup, "doc_id")
    n = joined.count()
    assert n > 0
    leaked = joined.where(F.col("split") != F.col("dup_split")).count()
    assert leaked == 0


def test_ivf_probe_index_equals_inline_topk(spark, tmp_path):
    import numpy as np

    from credit_card_etl_pipeline_spark.dataops.similarity import (
        ivf_fit,
        ivf_probe_index,
        ivf_topk,
        assign_cluster,
    )

    rng = np.random.RandomState(3)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.select("vec_id", quantize(F.col("embedding")).alias("qvec"))
    centroids = ivf_fit(q, k=4, iters=2)
    queries = q.where(F.col("vec_id") % 15 == 0)

    inline = sorted(
        map(tuple, ivf_topk(q, queries, centroids, k=5, nprobe=2).collect())
    )
    # materialize the index as cell-partitioned parquet and probe it
    path = str(tmp_path / "ivf_index")
    q.withColumn("cell", assign_cluster(F.col("qvec"), centroids)).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    idx = spark.read.parquet(path)
    probed = sorted(
        map(
            tuple,
            ivf_probe_index(idx, queries, centroids, k=5, nprobe=2).collect(),
        )
    )
    assert probed == inline


def test_dhash64_known_pattern_and_perturbation():
    from credit_card_etl_pipeline_spark.dataops.multimodal import dhash64
    from credit_card_etl_pipeline_spark.dataops import png as pngc
    from credit_card_etl_pipeline_spark.dataops.multimodal import (
        decode_image_gray,
    )

    # strict left-to-right gradient: every m[r][c] < m[r][c+1] → all
    # bits 0 → word 0, all bands 0
    inc = bytes(min(255, (i % 18) * 14) for i in range(288))
    word, bands = dhash64(18, 16, inc)
    assert word == 0 and bands == [0, 0, 0, 0]

    # reversed gradient → every bit 1 → word = -1 (all 64 bits set)
    dec = bytes(min(255, (17 - i % 18) * 14) for i in range(288))
    word2, bands2 = dhash64(18, 16, dec)
    assert word2 == -1 and bands2 == [0xFFFF] * 4

    # round-trip through the real PNG codec preserves the hash
    enc = pngc.encode_png(18, 16, 1, dec)
    w, h, gray = decode_image_gray(enc)
    assert dhash64(w, h, gray) == (word2, bands2)

    # a single-pixel bump flips at most 2 gradient bits
    bumped = bytearray(dec)
    bumped[40] = (bumped[40] + 64) % 256
    word3, _ = dhash64(18, 16, bytes(bumped))
    assert bin((word3 ^ word2) & ((1 << 64) - 1)).count("1") <= 2

    # dimension contract is enforced
    with pytest.raises(ValueError):
        dhash64(16, 16, bytes(256))


def test_gradient_fingerprint64_contract():
    from credit_card_etl_pipeline_spark.dataops.multimodal import (
        gradient_fingerprint64,
    )

    # strictly increasing → all bits 0; strictly decreasing → all 1
    assert gradient_fingerprint64(list(range(65))) == (0, [0, 0, 0, 0])
    w, bands = gradient_fingerprint64(list(range(65, 0, -1)))
    assert w == -1 and bands == [0xFFFF] * 4
    # a single spike on a rising run flips exactly one gradient bit
    # (k=10 turns 1; k=9 stays 0 since 9 > 1000 is still false)
    vals = list(range(65))
    vals[10] = 1000
    w2, _ = gradient_fingerprint64(vals)
    assert bin(w2 & ((1 << 64) - 1)).count("1") == 1
    with pytest.raises(ValueError):
        gradient_fingerprint64(list(range(64)))


def test_top_pc_finds_planted_direction(spark):
    from credit_card_etl_pipeline_spark.dataops.similarity import (
        PC_SCALE,
        top_pc,
    )

    # vectors spread along axis 2 with small noise on axis 0: the
    # dominant direction must land on axis 2 (|v[2]| = PC_SCALE).
    rows = [
        (i, [((i % 3) - 1) * 5, 0, (i - 10) * 400, 0]) for i in range(21)
    ]
    df = spark.createDataFrame(rows, "vec_id long, qvec array<long>")
    v = top_pc(df, iters=3)
    assert abs(v[2]) == PC_SCALE
    assert all(abs(x) < PC_SCALE // 100 for j, x in enumerate(v) if j != 2)

    # degenerate corpus (all identical): centered vectors are 0 → zero
    # vector, no crash
    same = spark.createDataFrame(
        [(i, [7, 7, 7, 7]) for i in range(5)], "vec_id long, qvec array<long>"
    )
    assert top_pc(same, iters=2) == [0, 0, 0, 0]


def test_morton_interleave_matches_reference(spark):
    """Bit-level check of the parallel-prefix spread: the z-value of
    (x, y) equals the directly-computed bit interleave for random and
    boundary inputs (0, 1, max 31-bit)."""
    import random

    from credit_card_etl_pipeline_spark.functions.zorder import (
        INPUT_MASK,
        morton_interleave,
    )

    def ref(x, y):
        x &= INPUT_MASK
        y &= INPUT_MASK
        z = 0
        for b in range(31):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rng = random.Random(11)
    cases = [(0, 0), (1, 0), (0, 1), (INPUT_MASK, INPUT_MASK)] + [
        (rng.randrange(1 << 31), rng.randrange(1 << 31)) for _ in range(20)
    ]
    df = spark.createDataFrame(cases, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in cases:
        assert got[(x, y)] == ref(x, y), (x, y)


def test_range_bucket_stretches_full_range(spark):
    """Range buckets must stretch narrow spans onto the full 8-bit
    range — the top bucket for span s lands at s*256 // (s+1) (247 for
    a 0..29 day index), i.e. in the highest cell-width, not at s
    itself — or the interleave degenerates to a single-key sort; the
    warehouse_zorder_write footer check depends on this."""
    from credit_card_etl_pipeline_spark.functions.zorder import (
        morton_key,
        range_bucket,
    )

    df = spark.createDataFrame([(i,) for i in range(30)], "v long")
    mm = df.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    out = (
        df.crossJoin(F.broadcast(mm))
        .select(
            range_bucket(F.col("v"), F.col("mn"), F.col("mx")).alias("b")
        )
        .agg(F.min("b"), F.max("b"))
        .first()
    )
    # 0..29 stretches onto equal-width cells: max bucket 29*256//30
    assert (out[0], out[1]) == (0, 247)
    # interleave of two full-range buckets stays within 16 bits
    z = (
        df.crossJoin(F.broadcast(mm))
        .select(
            morton_key(
                [
                    range_bucket(F.col("v"), F.col("mn"), F.col("mx")),
                    range_bucket(F.col("v"), F.col("mn"), F.col("mx")),
                ]
            ).alias("z")
        )
        .agg(F.max("z"))
        .first()[0]
    )
    assert 0 <= z < (1 << 16)


def test_within_group_dup_ids_matches_bruteforce(spark):
    """The vectorized gram-tile scorer == the O(n^2) reference model,
    including across tile boundaries (block=4 forces multi-tile paths
    on every group) and the strict lower-id rule."""
    import numpy as np
    import pandas as pd

    from credit_card_etl_pipeline_spark.dataops.similarity import (
        within_group_dup_ids,
    )

    rng = np.random.RandomState(7)
    rows = []
    for cell in range(3):
        base = rng.randint(-1000, 1000, size=(6, 8))
        for i in range(6):
            v = base[i].copy()
            rows.append((cell * 100 + i, v.tolist(), cell))
        # planted dups: copies of member 0 and 2 with higher ids
        rows.append((cell * 100 + 50, base[0].tolist(), cell))
        rows.append((cell * 100 + 51, base[2].tolist(), cell))
    pdf = pd.DataFrame(rows, columns=["vec_id", "qvec", "cell"])
    pdf["n2"] = pdf["qvec"].map(lambda v: int(sum(x * x for x in v)))

    df = spark.createDataFrame(pdf)
    got = {
        r.vec_id
        for r in within_group_dup_ids(
            df, ["cell"], threshold=0.999, block=4
        ).collect()
    }

    # brute force reference
    want = set()
    for cell, g in pdf.groupby("cell"):
        g = g.sort_values("vec_id").reset_index(drop=True)
        for j in range(len(g)):
            for i in range(j):
                a, b = np.array(g.qvec[i]), np.array(g.qvec[j])
                cos = float(a @ b) / np.sqrt(
                    float(g.n2[i]) * float(g.n2[j])
                )
                if cos >= 0.999:
                    want.add(int(g.vec_id[j]))
                    break
    assert got == want
    assert want  # the planted copies must actually be found


def test_reliable_checkpoint_conf_gate(spark, session_ckpt_dir):
    """spark.graft.reliableCheckpoint=true switches the distributed
    propagation loop's round checkpoints to checkpoint-dir storage
    (executor-loss safe; SIGKILL-certified by tools/soak_exec_kill.py).
    Uses the SESSION-scoped checkpoint dir (conftest) so this test
    neither depends on nor perturbs checkpoint state for the rest of
    the run; the missing-dir refusal is covered order-independently by
    test_reliable_checkpoint_requires_dir_fresh_session."""
    import os

    from credit_card_etl_pipeline_spark.dataops import dedup

    vertices = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    want = {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7}
    spark.conf.set(dedup.RELIABLE_CKPT_CONF, "true")
    try:
        out = {
            r["doc_id"]: r["component"]
            for r in dedup.connected_components(
                vertices, edges, driver_edge_cap=None
            ).collect()
        }
        assert out == want
        # reliable checkpoints actually landed on disk
        assert any(files for _, _, files in os.walk(session_ckpt_dir))
    finally:
        spark.conf.set(dedup.RELIABLE_CKPT_CONF, "false")


def test_reliable_checkpoint_requires_dir_fresh_session():
    """The missing-checkpoint-dir refusal, asserted UNCONDITIONALLY in
    a fresh subprocess SparkSession (the shared test session has a
    checkpoint dir pinned by conftest, so the raise branch can never
    execute there — previously this made the assertion order-
    dependent)."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import pytest
        from credit_card_etl_pipeline_spark.dataops import dedup
        from credit_card_etl_pipeline_spark.session import get_spark

        spark = get_spark(
            app_name="ckpt_gate", master="local[1]", shuffle_partitions=1
        )
        assert spark.sparkContext.getCheckpointDir() is None
        spark.conf.set(dedup.RELIABLE_CKPT_CONF, "true")
        vertices = spark.createDataFrame([(0,), (1,)], "doc_id long")
        edges = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
        try:
            dedup.connected_components(vertices, edges, driver_edge_cap=None)
        except RuntimeError as e:
            assert "checkpoint" in str(e), e
            print("RAISED_OK")
        else:
            raise SystemExit("reliable path ran without a checkpoint dir")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "RAISED_OK" in proc.stdout


def test_sanitize_unicode_contract(spark):
    """The cleaning contract: ZW strip -> NFC -> pinned-class collapse;
    NULL propagates; composed and decomposed forms converge to one md5."""
    import hashlib

    from credit_card_etl_pipeline_spark.dataops.text import sanitize_unicode

    composed = "café bar"           # é as one code point
    decomposed = "café bar"        # e + combining acute
    df = spark.createDataFrame(
        [
            (0, composed),
            (1, decomposed),
            (2, "a​b﻿c"),      # zero-width junk
            (3, "  \t\n  "),             # whitespace-only -> ''
            (4, None),
            (5, "ok \U0001f600 astral"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in sanitize_unicode(df).collect()}
    want_md5 = hashlib.md5(composed.encode()).hexdigest()
    assert out[0]["clean_md5"] == want_md5
    assert out[1]["clean_md5"] == want_md5          # NFC converges
    assert out[1]["changed"] and not out[0]["changed"]
    assert out[2]["n_zero_width"] == 2
    assert out[2]["clean_md5"] == hashlib.md5(b"abc").hexdigest()
    assert out[3]["n_chars_clean"] == 0 and out[3]["changed"]
    assert all(v is None for k, v in out[4].items() if k != "doc_id")
    assert out[5]["n_astral"] == 1 and not out[5]["changed"]


# ------------------------------------------------------------------
# URL canonicalization (dataops.urls)
# ------------------------------------------------------------------

_URL_CASES = [
    # (raw, expected canonical)
    ("https://Example.COM/a/b?x=2&a=1", "https://example.com/a/b?a=1&x=2"),
    ("HTTPS://WWW.EXAMPLE.COM:443/a/b/?a=1&x=2#frag",
     "https://example.com/a/b?a=1&x=2"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/", "http://example.com:8080/"),  # non-default
    ("https://example.com:80/", "https://example.com:80/"),  # wrong scheme
    ("https://example.com", "https://example.com/"),  # bare host -> '/'
    ("https://example.com/p?utm_source=x&utm_medium=y&fbclid=z&gclid=q"
     "&msclkid=m&ref=r", "https://example.com/p"),
    ("https://example.com/p?ref=r&real=1", "https://example.com/p?real=1"),
    ("https://example.com/p///", "https://example.com/p"),
    ("https://example.com/p?b=2&a=1&b=1", "https://example.com/p?a=1&b=1&b=2"),
]


def test_canonical_url_policy(spark):
    from credit_card_etl_pipeline_spark.dataops import urls as ur

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(_URL_CASES)],
        "i long, url string",
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", ur.canonical_url("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(_URL_CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonical_url_duckdb_twin_parity(spark):
    import duckdb

    from credit_card_etl_pipeline_spark.dataops import urls as ur

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(_URL_CASES)],
        "i long, url string",
    )
    spark_out = {
        r["i"]: r["c"]
        for r in df.select("i", ur.canonical_url("url").alias("c")).collect()
    }
    con = duckdb.connect()
    # NULL url: both engines must yield NULL (DuckDB concat would
    # otherwise skip the null fragments and emit junk)
    assert (
        con.execute(
            f"SELECT {ur.canonical_url_sql('url')} "
            "FROM (SELECT CAST(NULL AS VARCHAR) AS url)"
        ).fetchone()[0]
        is None
    )
    null_spark = (
        spark.createDataFrame([(None,)], "url string")
        .select(ur.canonical_url("url").alias("c"))
        .collect()[0]["c"]
    )
    assert null_spark is None
    for i, (raw, _) in enumerate(_URL_CASES):
        duck = con.execute(
            f"SELECT {ur.canonical_url_sql('url')} "
            "FROM (SELECT ? AS url)",
            [raw],
        ).fetchone()[0]
        assert duck == spark_out[i], f"{raw!r}: duck {duck!r} != spark"


def test_distribution_matched_sample(spark):
    from credit_card_etl_pipeline_spark.dataops.curate import (
        distribution_matched_sample,
    )

    # bucket 0: 900 rows (hot), bucket 1: 90, bucket 2: 10 (rare)
    rows = (
        [(i, 0) for i in range(900)]
        + [(i + 1000, 1) for i in range(90)]
        + [(i + 2000, 2) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, bucket long")
    out = {
        r["bucket"]: r.asDict()
        for r in distribution_matched_sample(
            df, bucket_col="bucket", id_col="doc_id"
        ).collect()
    }
    # uniform target share = 1000/3 per bucket
    assert out[0]["threshold_ppm"] == (1000 * 1_000_000) // (3 * 900)
    assert out[1]["threshold_ppm"] == 1_000_000  # under-represented: keep all
    assert out[2]["threshold_ppm"] == 1_000_000
    assert out[1]["n_sampled"] == 90 and out[2]["n_sampled"] == 10
    # hot bucket downsampled to ~the uniform share (md5 is uniform-ish)
    assert 200 <= out[0]["n_sampled"] <= 500
    # determinism: same call, same rows
    again = {
        r["bucket"]: r["n_sampled"]
        for r in distribution_matched_sample(
            df, bucket_col="bucket", id_col="doc_id"
        ).collect()
    }
    assert again == {b: d["n_sampled"] for b, d in out.items()}


def test_host_blocklist_rollup(spark):
    from credit_card_etl_pipeline_spark.dataops import urls as ur

    df = spark.createDataFrame(
        [
            (0, "https://WWW.Bad.com:443/x"),
            (1, "http://bad.com:80/y?utm_source=z"),
            (2, "https://good.org/a?b=2&a=1"),
            (3, "https://good.org/a?a=1&b=2"),  # same canonical as 2
            (4, "https://good.org/other"),
        ],
        "doc_id long, url string",
    )
    out = {
        r["host"]: r.asDict()
        for r in ur.host_blocklist_rollup(df, ["bad.com"]).collect()
    }
    assert "bad.com" not in out            # both spellings blocked
    assert out["good.org"]["n_docs"] == 3
    assert out["good.org"]["n_urls"] == 2  # 2 and 3 collapse


def test_assign_cluster_sql_text_matches_column_form(spark):
    """The SQL-text build path (one F.expr string, r11 plan-construction
    optimization) must produce the exact rows of the Column-API form on
    both codebook regimes (literal k<=16 and transform/aggregate
    k>16), including tie-breaks."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(80)]
    # duplicate vectors force exact dot ties across centroids
    vecs += [(100 + i, vecs[i][1]) for i in range(6)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.select("vec_id", sim.quantize(F.col("embedding")).alias("qvec"))
    for k in (4, sim.ASSIGN_LITERAL_MAX_K + 2):
        centroids = sim.ivf_fit(q, k=k, iters=1)
        col_form = q.select(
            "vec_id", sim.assign_cluster(F.col("qvec"), centroids).alias("c")
        ).collect()
        sql_form = q.select(
            "vec_id", sim.assign_cluster("qvec", centroids).alias("c")
        ).collect()
        assert sorted(map(tuple, col_form)) == sorted(map(tuple, sql_form))


def test_pq_codes_sql_text_matches_column_form(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(50)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.select("vec_id", sim.quantize(F.col("embedding")).alias("qvec"))
    books = sim.pq_fit(q, m=2, k=4, iters=1, dim=8)
    a = q.select(
        "vec_id",
        *[c.alias(f"c{s}") for s, c in enumerate(
            sim.pq_codes(F.col("qvec"), books, dim=8))],
    ).collect()
    b = q.select(
        "vec_id",
        *[c.alias(f"c{s}") for s, c in enumerate(
            sim.pq_codes("qvec", books, dim=8))],
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
