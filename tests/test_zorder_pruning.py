"""Z-order layout PRUNING EFFECTIVENESS — quantified, not asserted.

lineitem_zorder_layout verifies the clustered-write footers are tight;
these tests measure what that tightness buys: the fraction of files a
min/max-pruning reader skips for 2-D predicates, z-ordered layout vs a
linear single-key sort at the same file count.

Candidate files are computed from the real parquet output via per-file
(min, max) of both keys — exactly the statistics a footer-pruning scan
consults — so the ratios hold for any engine reading the layout, and at
100 TB where "file" means a 1 GB row-group run.

Measured at sf0.01 / 64 files (pinned with ~2x margin below):

    predicate          z-order skip   linear(orderkey-sort) skip
    2-D rectangle          0.88              0.88
    orderkey stripe        0.62              0.88
    partkey stripe         0.67              0.00   <- the point

The z-order claim is BALANCE: a linear layout prunes its sort key
perfectly and the other key not at all (worst case 0.00); z-order
prunes every key dimension decently (worst case ~0.62).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credit_card_etl_pipeline_spark.functions.zorder import (
    zorder_layout_write,
)

SF = "/root/testdata/sf0.01"
N_FILES = 64


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """lineitem written twice at the same file count: z-ordered on
    (orderkey, partkey) vs linearly range-sorted on orderkey alone."""
    root = tmp_path_factory.mktemp("zorder_layouts")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(root / "z")
    lpath = str(root / "linear")
    zorder_layout_write(
        li, ["l_orderkey", "l_partkey"], zpath, n_files=N_FILES
    )
    (
        li.repartitionByRange(N_FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    b = li.agg(
        F.min("l_orderkey").alias("omn"),
        F.max("l_orderkey").alias("omx"),
        F.min("l_partkey").alias("pmn"),
        F.max("l_partkey").alias("pmx"),
    ).collect()[0]
    o_span, p_span = b["omx"] - b["omn"], b["pmx"] - b["pmn"]
    rect = {
        "o_lo": b["omn"] + o_span * 2 // 10,
        "o_hi": b["omn"] + o_span * 3 // 10,
        "p_lo": b["pmn"] + p_span * 5 // 10,
        "p_hi": b["pmn"] + p_span * 6 // 10,
    }
    return spark, zpath, lpath, rect


def _file_bboxes(spark, path):
    """Per-file (min,max) of both keys — the footer stats a pruning
    reader consults."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("l_orderkey").alias("o0"),
            F.max("l_orderkey").alias("o1"),
            F.min("l_partkey").alias("p0"),
            F.max("l_partkey").alias("p1"),
        )
        .collect()
    )


def _skip_ratio(bboxes, pred) -> float:
    cand = sum(1 for r in bboxes if pred(r))
    return 1.0 - cand / len(bboxes)


def test_zorder_rectangle_and_stripe_skip_ratios(layouts):
    spark, zpath, lpath, r = layouts
    zb = _file_bboxes(spark, zpath)
    lb = _file_bboxes(spark, lpath)
    assert len(zb) == N_FILES and len(lb) == N_FILES

    def rect(x):
        return (
            x.o1 >= r["o_lo"]
            and x.o0 <= r["o_hi"]
            and x.p1 >= r["p_lo"]
            and x.p0 <= r["p_hi"]
        )

    def ostripe(x):
        return x.o1 >= r["o_lo"] and x.o0 <= r["o_hi"]

    def pstripe(x):
        return x.p1 >= r["p_lo"] and x.p0 <= r["p_hi"]

    # 2-D rectangle (10% x 10% of the key space): the z layout must
    # skip most files (measured 0.88; pinned with margin).
    assert _skip_ratio(zb, rect) >= 0.75

    # Second-dimension stripe: the linear layout cannot prune AT ALL
    # (every file spans the full partkey range); z-order still skips
    # a solid majority-adjacent share (measured 0.67).
    assert _skip_ratio(lb, pstripe) == 0.0
    assert _skip_ratio(zb, pstripe) >= 0.50

    # The balance claim, quantified: z-order's WORST single-key skip
    # beats linear's worst (which is zero) by a wide margin.
    z_worst = min(_skip_ratio(zb, ostripe), _skip_ratio(zb, pstripe))
    l_worst = min(_skip_ratio(lb, ostripe), _skip_ratio(lb, pstripe))
    assert z_worst >= 0.50
    assert l_worst == 0.0


def test_zorder_rectangle_scan_pushes_both_keys(layouts):
    """The read-back rectangle predicate must reach the parquet scan
    as PushedFilters on BOTH keys — literal bounds are what make the
    footer skipping above happen inside Spark's own reader too."""
    spark, zpath, _, r = layouts
    # the 100-char default elides the tail of the PushedFilters list
    # ("LessThanOrEqua..."), hiding exactly the filters under test;
    # the length is read when the scan node is BUILT, so set it first
    before = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = spark.read.parquet(zpath).where(
            F.col("l_orderkey").between(r["o_lo"], r["o_hi"])
            & F.col("l_partkey").between(r["p_lo"], r["p_hi"])
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", before)
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ]
    assert pushed, plan
    line = pushed[0]
    for want in (
        f"GreaterThanOrEqual(l_orderkey,{r['o_lo']})",
        f"LessThanOrEqual(l_orderkey,{r['o_hi']})",
        f"GreaterThanOrEqual(l_partkey,{r['p_lo']})",
        f"LessThanOrEqual(l_partkey,{r['p_hi']})",
    ):
        assert want in line, (want, line)


def test_zorder_scan_reads_fewer_rows_than_linear(layouts):
    """End-to-end: Spark's own scan over the z layout materializes far
    fewer rows for the partkey stripe than over the linear layout —
    the file/row-group skipping is real, not just a bbox computation.
    numOutputRows of the scan node is the post-pruning row count."""
    spark, zpath, lpath, r = layouts

    def scan_rows(path):
        df = spark.read.parquet(path).where(
            F.col("l_partkey").between(r["p_lo"], r["p_hi"])
        )
        # run THIS DataFrame's own query execution (a write would build
        # a separate execution and leave these metrics at zero)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
        # scan node is the leaf; its metrics carry numOutputRows
        node = plan
        while node.children().length() > 0:
            node = node.children().apply(0)
        return node.metrics().apply("numOutputRows").value()

    z_rows = scan_rows(zpath)
    l_rows = scan_rows(lpath)
    # linear layout cannot prune the stripe: it surfaces every row to
    # the filter.  The z layout's reader skips whole row groups.
    assert l_rows == spark.read.parquet(lpath).count()
    assert z_rows <= 0.55 * l_rows, (z_rows, l_rows)


def test_zorder_layout_write_rejects_empty_and_all_null(spark, tmp_path):
    """Empty input / all-NULL key used to crash as int(None) deep in
    the bucket expressions; must fail at the boundary (ADVICE r8)."""
    empty = spark.createDataFrame([], "a long, b long")
    with pytest.raises(ValueError, match="no non-NULL values"):
        zorder_layout_write(empty, ["a", "b"], str(tmp_path / "e"),
                            n_files=2)
    nulls = spark.createDataFrame([(None, 1), (None, 2)], "a long, b long")
    with pytest.raises(ValueError, match=r"\['a'\]"):
        zorder_layout_write(nulls, ["a", "b"], str(tmp_path / "n"),
                            n_files=2)
