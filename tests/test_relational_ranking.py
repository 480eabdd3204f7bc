"""asof_join / range_join / hypertable_rollup (ops/relational.py)
and integer BM25 (ops/ranking.py)."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from rsoup_spark.ops.ranking import bm25_topk
from rsoup_spark.ops.relational import (
    asof_join,
    hypertable_rollup,
    range_join,
)


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.mark.spark
def test_asof_join_semantics(spark):
    """Backward inclusive match, per-key isolation, null on no-match."""
    left = spark.createDataFrame(
        [(1, _ts(1), "a"), (1, _ts(5), "b"), (1, _ts(10), "c"),
         (2, _ts(4), "d")],
        "k int, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 50), (1, _ts(7), 70), (2, _ts(9), 90)],
        "k int, rts timestamp_ntz, rv int",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["rv"],
    )
    got = {(r.k, r.tag): r.rv for r in out.collect()}
    assert got == {
        (1, "a"): None,   # nothing at or before t=1
        (1, "b"): 50,     # equal timestamp matches (inclusive)
        (1, "c"): 70,     # latest prior, not just any prior
        (2, "d"): None,   # key 2's only right row is in the future
    }


@pytest.mark.spark
def test_asof_join_carries_multiple_right_cols(spark):
    left = spark.createDataFrame(
        [(1, _ts(8), 0.5)], "k int, ts timestamp_ntz, v double"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 20, "x"), (1, _ts(6), 60, "y")],
        "k int, rts timestamp_ntz, rv int, rtag string",
    )
    row = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["rv", "rtag"],
    ).collect()[0]
    assert (row.rv, row.rtag, row.v) == (60, "y", 0.5)


def _bm25_reference(corpus, terms, cap=10**12):
    """Independent per-doc integer BM25 (k1=1.2, b=0.75 cleared to
    the ppm rationals of ops/ranking.py)."""
    toks = {i: t.strip().split() for i, t in corpus}
    n = len(toks)
    avgdl = max(sum(len(v) for v in toks.values()) // n, 1)
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for i, v in toks.items():
        s = 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            sp = (tf * 44 * avgdl * 1_000_000) // (
                20 * tf * avgdl + 6 * avgdl + 18 * len(v)
            )
            idf = min(
                ((2 * (n - dfs[t]) + 1) * 1_000_000) // (2 * dfs[t] + 1),
                cap,
            )
            s += sp * idf // 1_000_000
        scores[i] = s
    return scores


@pytest.mark.spark
def test_bm25_matches_reference(spark):
    corpus = [
        (0, "spark join join window fast"),
        (1, "join join join join join join join join join join"),
        (2, "window table join scan"),
        (3, "join terms here common join"),
        (4, "spark"),
        (5, "nothing relevant whatsoever"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r.doc_id: r.score_ppm
        for r in bm25_topk(df, ("spark", "join", "window"), k=10).collect()
    }
    ref = _bm25_reference(corpus, ("spark", "join", "window"))
    expected = {i: s for i, s in ref.items() if s > 0}
    assert got == expected
    # rare term (df=2 'spark') must outweigh a saturating flood of a
    # common one (df=4 'join'): doc 4 ranks above doc 1
    assert got[4] > got[1]


def _bands(spark, n=10):
    return spark.range(0, n).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 2.5).alias("lo"),
        (F.col("id") * 2.5 + 4.0).alias("hi"),
    )


@pytest.mark.spark
def test_range_join_half_open_and_overlap(spark):
    """Half-open [lo, hi): boundary points join the opening interval
    only; overlapping bands each match; out-of-domain points drop."""
    pts = spark.createDataFrame(
        [(0, 0.0), (1, 2.5), (2, 4.0), (3, 999.0), (4, -1.0)],
        "pid long, v double",
    )
    out = range_join(pts, _bands(spark), "v", "lo", "hi", bin_width=2.5)
    got = sorted((r.pid, r.band_id) for r in out.collect())
    assert got == [(0, 0), (1, 0), (1, 1), (2, 1)]


@pytest.mark.spark
def test_range_join_degenerate_interval_matches_nothing(spark):
    pts = spark.createDataFrame([(0, 5.0)], "pid long, v double")
    iv = spark.createDataFrame(
        [(0, 5.0, 5.0), (1, 6.0, 4.0)], "band_id long, lo double, hi double"
    )
    assert range_join(pts, iv, "v", "lo", "hi", bin_width=1.0).count() == 0


@pytest.mark.spark
def test_range_join_wide_interval_raises(spark):
    """A single interval spanning >= max_bins bins must fail loudly
    (executor-side raise_error), not silently replicate web-scale."""
    pts = spark.createDataFrame([(0, 5.0)], "pid long, v double")
    iv = spark.createDataFrame(
        [(0, 0.0, 1000.0)], "band_id long, lo double, hi double"
    )
    with pytest.raises(Exception, match="range_join.*broadcast wide"):
        range_join(
            pts, iv, "v", "lo", "hi", bin_width=1.0,
            max_bins_per_interval=16,
        ).count()


@pytest.mark.spark
def test_range_join_plan_is_equi_join(spark):
    """The whole point: the interval predicate must plan as a hash-
    partitionable equi-join on the bin key, never a nested-loop."""
    from rsoup_spark.plans.review import plan_text

    pts = spark.range(0, 100).select(
        F.col("id").alias("pid"), (F.col("id") % 50 * 1.0).alias("v")
    )
    txt = plan_text(
        range_join(pts, _bands(spark), "v", "lo", "hi", bin_width=2.5)
    )
    assert "BroadcastNestedLoopJoin" not in txt
    assert "CartesianProduct" not in txt
    assert "Join" in txt


@pytest.mark.spark
def test_hypertable_rollup_values_and_null_ts(spark):
    """Per-resolution buckets agree with hand-computed sums; NULL
    timestamps roll up under a NULL bucket in EVERY resolution (the
    grouping() flags, not value inspection, pick the set)."""
    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:15:00", "a", 3),
         (2, "2024-01-01 10:45:00", "a", 4),
         (3, "2024-01-02 03:00:00", "b", 5),
         (4, None, "a", 7)],
        "eid long, ts string, k string, c long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = hypertable_rollup(
        ev, "ts", ["k"],
        [F.count("*").alias("n"), F.sum("c").alias("s")],
        resolutions=("hour", "day"),
    )
    got = {
        (r.resolution, str(r.bucket_ts), r.k): (r.n, r.s)
        for r in out.collect()
    }
    assert got[("hour", "2024-01-01 10:00:00", "a")] == (2, 7)
    assert got[("day", "2024-01-01 00:00:00", "a")] == (2, 7)
    assert got[("day", "2024-01-02 00:00:00", "b")] == (1, 5)
    assert got[("hour", "None", "a")] == (1, 7)
    assert got[("day", "None", "a")] == (1, 7)
    assert len(got) == 6


@pytest.mark.spark
def test_hypertable_rollup_single_scan(spark):
    """Grouping sets = ONE scan + one Expand; the naive UNION ALL
    shape (R scans of the fact table) must not come back."""
    from rsoup_spark.plans.review import plan_text

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:15:00", "a", 3)],
        "eid long, ts string, k string, c long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    txt = plan_text(
        hypertable_rollup(
            ev, "ts", ["k"], [F.count("*").alias("n")],
            resolutions=("hour", "day", "week"),
        )
    )
    assert txt.count("Expand") >= 1
    assert txt.count("Union") == 0


@pytest.mark.spark
def test_bm25_deterministic_topk_ties(spark):
    """Equal scores break by ascending doc id, and k truncates."""
    df = spark.createDataFrame(
        [(i, "spark x") for i in range(6)], "doc_id long, text string"
    )
    out = bm25_topk(df, ("spark",), k=3).collect()
    assert [r.doc_id for r in out] == [0, 1, 2]
    assert len({r.score_ppm for r in out}) == 1
