"""asof_join (ops/relational.py) and integer BM25 (ops/ranking.py)."""

import datetime as dt

import pytest

from rsoup_spark.ops.ranking import bm25_topk
from rsoup_spark.ops.relational import asof_join


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


@pytest.mark.spark
def test_bm25_deterministic_topk_ties(spark):
    """Equal scores break by ascending doc id, and k truncates."""
    df = spark.createDataFrame(
        [(i, "spark x") for i in range(6)], "doc_id long, text string"
    )
    out = bm25_topk(df, ("spark",), k=3).collect()
    assert [r.doc_id for r in out] == [0, 1, 2]
    assert len({r.score_ppm for r in out}) == 1
