"""Crawler-trap admission (crawl/traps.py) and the hashed quality
classifier (ops/textstats.py) -- edge cases the gate fixtures don't
reach: non-adjacent repeats, empty paths, '='-less query params,
duplicate input rows, and a pure-Python replay of the hashing trick.
"""

import hashlib

import pytest

from rsoup_spark.crawl.traps import url_templates
from rsoup_spark.ops.textstats import quality_classifier


def _stats(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    rows = url_templates(df, **kw).collect()
    return {(r["host"], r["template"]): r.asDict() for r in rows}


@pytest.mark.spark
def test_loop_tell_is_adjacent_only(spark):
    got = _stats(spark, [
        "https://a.example/x/x/page1",      # adjacent dup -> loop
        "https://a.example/x/y/x/page2",    # non-adjacent -> fine
        "https://a.example/",               # no segments -> fine
    ])
    by_loop = {k: v["n_loop"] for k, v in got.items()}
    assert by_loop[("a.example", "/x/x/pageN")] == 1
    assert by_loop[("a.example", "/x/y/x/pageN")] == 0
    assert by_loop[("a.example", "/")] == 0


@pytest.mark.spark
def test_template_masking_and_query_names(spark):
    got = _stats(spark, [
        # hex run masks before digits; query names sort; values drop
        "https://b.example/sess/0123456789abcdef/p?z=9&a=1",
        "https://b.example/sess/fedcba9876543210/p?a=2&z=8",
        # short hex run is NOT masked as hex ('cafe' < 8 chars)
        "https://b.example/cafe/p",
        # '='-less param keeps its name
        "https://b.example/p?flag&x=1",
    ])
    assert ("b.example", "/sess/H/p?a&z") in got
    assert got[("b.example", "/sess/H/p?a&z")]["n_urls"] == 2
    assert ("b.example", "/cafe/p") in got
    assert ("b.example", "/p?flag&x") in got


@pytest.mark.spark
def test_budget_and_distinct_counting(spark):
    urls = [f"https://c.example/item/{i}" for i in range(7)]
    got = _stats(spark, urls + urls, budget=5)  # duplicates collapse
    row = got[("c.example", "/item/N")]
    assert row["n_urls"] == 7
    assert row["n_admissible"] == 7
    assert row["n_kept"] == 5
    assert row["over_budget"]


@pytest.mark.spark
def test_depth_tell(spark):
    deep = "https://d.example/" + "/".join(f"s{i}" for i in range(13)) + "/x"
    got = _stats(spark, [deep], max_depth=12)
    (row,) = got.values()
    assert row["n_deep"] == 1 and row["n_admissible"] == 0
    assert row["n_kept"] == 0 and not row["over_budget"]


def _py_score(text, dim=4096, span=1000):
    """Pure-Python replay of the md5 hashing trick."""
    toks = [t for t in text[:100000].lower().split() if t]
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return len(feats), sum(
        h(f"w|{h('q|' + t) % dim}") % (2 * span + 1) - span for t in feats
    )


@pytest.mark.spark
def test_quality_classifier_matches_python_replay(spark):
    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "word"),                      # single token: no bigrams
        (2, "a b a b a b"),               # repeated features count
        (3, "   spaced    out   text "),  # whitespace runs collapse
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in quality_classifier(df).collect()}
    for doc_id, text in docs:
        n, score = _py_score(text)
        assert got[doc_id]["n_features"] == n, doc_id
        assert got[doc_id]["score"] == score, doc_id
        assert got[doc_id]["keep"] == (score >= 0), doc_id


@pytest.mark.spark
def test_url_filter_edges(spark):
    from rsoup_spark.crawl.traps import url_filter

    urls = [
        "https://notspam.example/fine",        # suffix, NOT a subdomain
        "https://spam.example/x",              # exact blocked host
        "https://a.b.spam.example/x",          # deep subdomain
        "https://ok.example/CASINO/night",     # case-insensitive word
        "https://ok.example/pills",            # single soft word: keep
        "https://ok.example/pills/betting/download",  # 3 soft: keep (3<5)
        "https://ok.example/poker/pills",      # 4+1 = 5: reject
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    got = {r["url"]: r.asDict() for r in url_filter(df).collect()}
    assert got[urls[0]]["keep"] and not got[urls[0]]["blocked_domain"]
    assert got[urls[1]]["blocked_domain"] and not got[urls[1]]["keep"]
    assert got[urls[2]]["blocked_domain"]
    assert got[urls[3]]["url_score"] == 4 and got[urls[3]]["keep"]
    assert got[urls[4]]["url_score"] == 1 and got[urls[4]]["keep"]
    assert got[urls[5]]["url_score"] == 3 and got[urls[5]]["keep"]
    assert got[urls[6]]["url_score"] == 5 and not got[urls[6]]["keep"]
