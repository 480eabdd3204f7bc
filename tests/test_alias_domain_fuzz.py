"""Property fuzz for the round-5 crawl-graph ops: resolve_aliases
pinned against a pure-Python chain walker on random functional graphs
(chains, cycles, self-loops, duplicate edges, dense hubs), and
registrable_domain against a reference longest-suffix matcher on
random label stacks.  The oracle gates pin the fixed fixtures; this
drives the shapes a deterministic fixture never reaches."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rsoup_spark.crawl.traps import PUBLIC_SUFFIXES, registrable_domain
from rsoup_spark.ops.graph import resolve_aliases

_node = st.integers(min_value=0, max_value=9)


def _walk(mapping, src, max_hops):
    """Reference semantics: follow the min-dst functional graph up to
    max_hops; terminal within budget -> (dst, hops, 'ok'), else
    (None, None, 'capped')."""
    cur, hops = src, 0
    while cur in mapping:
        if hops >= max_hops:
            return (None, None, "capped")
        cur = mapping[cur]
        hops += 1
    if hops <= max_hops:
        return (cur, hops, "ok")
    return (None, None, "capped")


@pytest.mark.spark
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(_node, _node), min_size=1, max_size=25),
       st.integers(min_value=1, max_value=6))
def test_resolve_aliases_matches_walker(spark, edges, max_hops):
    mapping = {}
    for s, d in edges:
        mapping[s] = min(mapping.get(s, d), d)
    df = spark.createDataFrame(
        [(f"n{s}", f"n{d}") for s, d in edges], "src STRING, dst STRING"
    )
    got = {
        r["src"]: (r["resolved"], r["hops"], r["status"])
        for r in resolve_aliases(df, max_hops=max_hops).collect()
    }
    named = {f"n{a}": f"n{b}" for a, b in mapping.items()}
    exp = {f"n{s}": _walk(named, f"n{s}", max_hops) for s in mapping}
    assert got == exp


_tlds = ["com", "uk", "zz", "io"]
_label = st.sampled_from(["a", "bb", "co", "ac", "github", "blogspot",
                          "s3", "amazonaws", "example", "x"])


def _ref_suffix(host):
    labels = host.split(".")
    for k in (3, 2, 1):
        if len(labels) >= k:
            cand = ".".join(labels[-k:])
            if cand in PUBLIC_SUFFIXES and cand.count(".") + 1 == k:
                return cand
    return labels[-1]


@pytest.mark.spark
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(_label, min_size=1, max_size=4).map(
        lambda ls: ".".join(ls)
    ).flatmap(
        lambda stem: st.sampled_from(_tlds).map(
            lambda t: f"{stem}.{t}"
        )
    ),
    min_size=1, max_size=15,
))
def test_registrable_domain_matches_reference(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host STRING")
    got = {
        r["host"]: (r["r"]["suffix"], r["r"]["registrable"])
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("r")
        ).collect()
    }
    for h in set(hosts):
        sfx = _ref_suffix(h)
        labels = h.split(".")
        k = sfx.count(".") + 1
        reg = (".".join(labels[-k - 1:]) if len(labels) > k else None)
        assert got[h] == (sfx, reg), h
