"""Round-5 additions beyond the gate fixtures: alias-chain resolution
(ops/graph.py:resolve_aliases) edge cases the synthetic redirect graph
doesn't reach (duplicate-edge collapse, self-loops, chains exactly at
the cap, doubling past max_hops), public-suffix extraction corner
cases (crawl/traps.py:registrable_domain), and a pure-Python replay of
the integer bits-of-surprise model (ops/textstats.py:lm_surprise).
"""

import math

import pytest
from pyspark.sql import functions as F

from rsoup_spark.crawl.traps import domain_rollup, registrable_domain
from rsoup_spark.ops.graph import resolve_aliases
from rsoup_spark.ops.textstats import lm_surprise


def _resolve(spark, edges, max_hops=5):
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    rows = resolve_aliases(df, max_hops=max_hops).collect()
    return {r["src"]: (r["resolved"], r["hops"], r["status"]) for r in rows}


@pytest.mark.spark
def test_chain_exactly_at_cap_resolves(spark):
    # a -> b -> c -> d -> e -> f: 5 hops from a, exactly max_hops
    edges = [(x, y) for x, y in zip("abcde", "bcdef")]
    got = _resolve(spark, edges, max_hops=5)
    assert got["a"] == ("f", 5, "ok")
    assert got["e"] == ("f", 1, "ok")


@pytest.mark.spark
def test_chain_one_past_cap_is_capped(spark):
    # 6 hops from a with cap 5: terminal exists but the fetcher gives up
    edges = [(x, y) for x, y in zip("abcdef", "bcdefg")]
    got = _resolve(spark, edges, max_hops=5)
    assert got["a"] == (None, None, "capped")
    assert got["b"] == ("g", 5, "ok")


@pytest.mark.spark
def test_self_loop_and_cycle_are_capped(spark):
    got = _resolve(spark, [("s", "s"), ("p", "q"), ("q", "p"), ("x", "p")])
    assert got["s"] == (None, None, "capped")
    assert got["p"] == (None, None, "capped")
    assert got["x"] == (None, None, "capped")


@pytest.mark.spark
def test_duplicate_edges_collapse_to_min_dst(spark):
    # two redirects recorded for 'a': deterministic min(dst) wins
    got = _resolve(spark, [("a", "z"), ("a", "b"), ("b", "c")])
    assert got["a"] == ("c", 2, "ok")


@pytest.mark.spark
def test_long_chain_detected_by_doubling(spark):
    # 16-hop chain with max_hops=16 needs ceil(log2(16)) = 4 rounds,
    # not 16 joins; the head resolves with the exact hop count
    names = [f"n{i:02d}" for i in range(17)]
    edges = list(zip(names, names[1:]))
    got = _resolve(spark, edges, max_hops=16)
    assert got["n00"] == ("n16", 16, "ok")
    # same chain under a tighter cap: over-cap heads are capped,
    # in-cap tails resolve
    got5 = _resolve(spark, edges, max_hops=5)
    assert got5["n00"] == (None, None, "capped")
    assert got5["n11"] == ("n16", 5, "ok")


def _suffixes(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host STRING")
    rows = df.select(
        "host", registrable_domain(F.col("host")).alias("r")
    ).collect()
    return {r["host"]: (r["r"]["suffix"], r["r"]["registrable"])
            for r in rows}


@pytest.mark.spark
def test_registrable_domain_longest_match_wins(spark):
    got = _suffixes(spark, [
        "a.example.com",          # 1-label suffix
        "www.site.co.uk",         # 2-label beats 'uk'
        "x.github.io",            # private-registry 2-label beats 'io'
        "cdn.s3.amazonaws.com",   # 3-label beats 'com'
        "foo.custom.zz",          # unknown TLD -> PSL default rule
        "co.uk",                  # host IS a suffix -> no registrable
        "com",                    # bare 1-label suffix
    ])
    assert got["a.example.com"] == ("com", "example.com")
    assert got["www.site.co.uk"] == ("co.uk", "site.co.uk")
    assert got["x.github.io"] == ("github.io", "x.github.io")
    assert got["cdn.s3.amazonaws.com"] == (
        "s3.amazonaws.com", "cdn.s3.amazonaws.com"
    )
    assert got["foo.custom.zz"] == ("zz", "custom.zz")
    assert got["co.uk"] == ("co.uk", None)
    assert got["com"] == ("com", None)


@pytest.mark.spark
def test_domain_rollup_counts_hosts_not_urls(spark):
    urls = (
        ["https://a.example.com/%d" % i for i in range(3)]
        + ["https://b.example.com/x"]
        + ["https://only.co.uk/y", "https://co.uk/"]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    rows = domain_rollup(df).collect()
    got = {(r["domain"], r["is_suffix_only"]):
           (r["n_urls"], r["n_hosts"]) for r in rows}
    assert got[("example.com", False)] == (4, 2)
    assert got[("only.co.uk", False)] == (1, 1)
    assert got[("co.uk", True)] == (1, 1)


def _lm_expected(docs, train_sources, threshold):
    """Pure-Python replay: add-one bigram LM, bits = floor(log2((C1+V)
    DIV (C2+1))), per-doc millibits with integer division."""
    def toks(t):
        return [w for w in t.lower().split() if w]

    c1, c2, vocab = {}, {}, set()
    for _, src, text in docs:
        if src in train_sources:
            ts = toks(text)
            for a, b in zip(ts, ts[1:]):
                c1[a] = c1.get(a, 0) + 1
                c2[(a, b)] = c2.get((a, b), 0) + 1
                vocab.update((a, b))
    v = len(vocab)
    out = {}
    for did, _, text in docs:
        ts = toks(text)
        bgs = list(zip(ts, ts[1:]))
        if not bgs:
            out[did] = (0, None, None, False)
            continue
        total = sum(
            (( (c1.get(a, 0) + v) // (c2.get((a, b), 0) + 1) )
             ).bit_length() - 1
            for a, b in bgs
        )
        mb = 1000 * total // len(bgs)
        out[did] = (len(bgs), total, mb, mb <= threshold)
    return out


@pytest.mark.spark
def test_lm_surprise_matches_pure_python(spark):
    docs = [
        (1, "train", "the cat sat on the mat"),
        (2, "train", "the cat sat on the hat"),
        (3, "other", "the cat sat on the mat"),     # fluent -> low bits
        (4, "other", "zq xv qp zz vv xx"),           # gibberish -> high
        (5, "other", "single"),                      # no bigram
        (6, "other", ""),                            # empty text
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, source STRING, text STRING")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["total_bits"],
                      r["millibits_per_bigram"], r["keep"])
        for r in lm_surprise(
            df, F.col("source") == "train", threshold_millibits=1500
        ).collect()
    }
    exp = _lm_expected(docs, {"train"}, 1500)
    assert got == exp
    # sanity on the semantics themselves, not just engine parity:
    # in-model text scores strictly fewer bits than gibberish, and the
    # 1500-millibit threshold separates them (1200 vs 2000 here)
    assert got[3][2] < got[4][2]
    assert got[3][3] is True and got[4][3] is False
    assert got[5] == (0, None, None, False)
    assert got[6] == (0, None, None, False)


def test_bits_identity_floor_log2():
    # floor(log2(floor(a/b))) == floor(log2(a/b)) for positive ints --
    # the identity the integer model rests on
    for a in range(1, 200):
        for b in range(1, 50):
            if a >= b:
                assert (a // b).bit_length() - 1 == math.floor(
                    math.log2(a / b)
                )
