"""funnel (ops/events.py), count-min sketch (ops/sketch.py), and
inverted-index postings (ops/ranking.py)."""

import pytest

from pyspark.sql import functions as F

from rsoup_spark.ops.events import funnel
from rsoup_spark.ops.ranking import build_postings
from rsoup_spark.ops.sketch import cms_build, cms_estimate


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


@pytest.mark.spark
def test_funnel_order_window_and_ties(spark):
    ev = _ev(spark, [
        # full conversion inside window
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # click before the first view never counts; the later click
        # falls outside the 1-day window anchored at the view
        (2, "2024-01-01 00:00:00", "click"),
        (2, "2024-01-01 01:00:00", "view"),
        (2, "2024-01-05 00:00:00", "click"),
        # same-timestamp events advance in step order
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-01 00:00:00", "click"),
        # purchase BETWEEN view and click does not satisfy step 3
        (4, "2024-01-01 00:00:00", "view"),
        (4, "2024-01-01 01:00:00", "purchase"),
        (4, "2024-01-01 02:00:00", "click"),
        # non-step events are invisible to the funnel
        (5, "2024-01-01 00:00:00", "error"),
        (5, "2024-01-01 01:00:00", "click"),
    ])
    got = {
        r.user_id: (r.reached, r.t_first_us)
        for r in funnel(ev, ["view", "click", "purchase"], 86400).collect()
    }
    epoch = 1704067200000000  # 2024-01-01 naive-as-UTC
    assert got[1] == (3, epoch)
    assert got[2] == (1, epoch + 3600_000_000)
    assert got[3] == (2, epoch)
    assert got[4] == (2, epoch)
    assert got[5] == (0, -1)  # only a click, never anchored
    assert len(got) == 5


@pytest.mark.spark
def test_funnel_window_anchors_at_first_step(spark):
    """The window anchors at the FIRST view, even when a later view
    would let the sequence fit -- greedy anchoring, same as the
    oracle's min(t1)."""
    ev = _ev(spark, [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-10 00:00:00", "view"),
        (1, "2024-01-10 01:00:00", "click"),
    ])
    row = funnel(ev, ["view", "click"], 86400).collect()[0]
    assert (row.reached, row.t_first_us) == (1, 1704067200000000)


@pytest.mark.spark
def test_cms_never_underestimates_and_is_exact_when_wide(spark):
    df = spark.createDataFrame(
        [(i % 13,) for i in range(500)], "k long"
    )
    true = {i: (500 // 13) + (1 if i < 500 % 13 else 0) for i in range(13)}
    keys = spark.range(0, 16).select(F.col("id").alias("k"))

    narrow = cms_estimate(
        cms_build(df, "k", depth=3, width=8), keys, "k", depth=3, width=8
    )
    for r in narrow.collect():
        assert r.est >= true.get(r.k, 0), (r.k, r.est)

    wide = cms_estimate(
        cms_build(df, "k", depth=4, width=4096), keys, "k",
        depth=4, width=4096,
    )
    got = {r.k: r.est for r in wide.collect()}
    assert got == {i: true.get(i, 0) for i in range(16)}


@pytest.mark.spark
def test_cms_weighted_and_mergeable(spark):
    """Weighted build, and sketch-of-union == cellwise sum of the
    per-part sketches (the merge law incremental pipelines rely on)."""
    a = spark.createDataFrame([(1, 5), (2, 7)], "k long, w long")
    b = spark.createDataFrame([(1, 3), (3, 2)], "k long, w long")
    kw = dict(depth=3, width=16)
    sk_union = cms_build(a.unionByName(b), "k", weight_col="w", **kw)
    merged = (
        cms_build(a, "k", weight_col="w", **kw)
        .unionByName(cms_build(b, "k", weight_col="w", **kw))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    as_map = lambda df: {  # noqa: E731
        (r.row, r.cell): r.cnt for r in df.collect()
    }
    assert as_map(sk_union) == as_map(merged)
    keys = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    est = {r.k: r.est for r in cms_estimate(sk_union, keys, "k", **kw).collect()}
    assert est[1] >= 8 and est[2] >= 7 and est[3] >= 2


@pytest.mark.spark
def test_cms_estimate_preserves_duplicate_probe_rows(spark):
    """N identical probe rows in -> N estimate rows out (the point-
    query contract): a join-produced probe frame must not silently
    shrink."""
    from rsoup_spark.ops.sketch import cms_build, cms_estimate

    sk = cms_build(
        spark.createDataFrame([(7,)] * 4, "k long"), "k",
        depth=3, width=64,
    )
    keys = spark.createDataFrame([(7,), (7,), (7,), (9,)], "k long")
    rows = cms_estimate(sk, keys, "k", depth=3, width=64).collect()
    assert sorted((r.k, r.est) for r in rows) == \
        [(7, 4), (7, 4), (7, 4), (9, 0)]


@pytest.mark.spark
def test_hll_estimate_within_error_bounds(spark):
    """Relative error stays within ~3x the theoretical 1.04/sqrt(m)
    standard error across two decades of cardinality."""
    from rsoup_spark.ops.sketch import hll_build, hll_estimate

    for n, p in ((300, 8), (10000, 8)):
        df = spark.range(0, n).select(
            F.concat(F.lit("k"), F.col("id")).alias("k")
        )
        est = hll_estimate(hll_build(df, "k", p=p), p=p)
        tol = 3 * 1.04 / (1 << p) ** 0.5
        assert abs(est - n) / n < tol, (n, p, est)


@pytest.mark.spark
def test_hll_registers_merge_by_max(spark):
    """Register table of a union == elementwise MAX of the parts'
    register tables -- the merge law distributed builds rely on."""
    from rsoup_spark.ops.sketch import hll_build

    a = spark.range(0, 400).select(F.col("id").cast("string").alias("k"))
    b = spark.range(200, 700).select(F.col("id").cast("string").alias("k"))
    whole = hll_build(a.unionByName(b), "k", p=5)
    merged = (
        hll_build(a, "k", p=5)
        .unionByName(hll_build(b, "k", p=5))
        .groupBy("reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    as_map = lambda df: {r.reg: r.max_rho for r in df.collect()}  # noqa: E731
    assert as_map(whole) == as_map(merged)


@pytest.mark.spark
def test_postings_layout_and_df_bounds(spark):
    docs = spark.createDataFrame(
        [(10, "a b a"), (2, "b c a"), (3, "a"), (4, "c")],
        "doc_id long, text string",
    )
    out = {
        r.term: (r.df, r.total_tf, r.postings)
        for r in build_postings(docs).collect()
    }
    # doc-sorted numerically (2 before 10), tf per doc correct
    assert out["a"] == (3, 4, "2:1,3:1,10:2")
    assert out["b"] == (2, 2, "2:1,10:1")
    assert out["c"] == (2, 2, "2:1,4:1")

    capped = {
        r.term for r in build_postings(docs, min_df=2, max_df=2).collect()
    }
    assert capped == {"b", "c"}  # 'a' (df=3) is stop-capped out
