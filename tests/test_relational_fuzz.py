"""Property fuzz: asof_join and range_join pinned against DuckDB's
native implementations on adversarial random inputs -- duplicate
timestamps, boundary equality, empty/one-sided keys, negative values.
The oracle gates already pin both at sf0.01; this drives the edge
distributions a uniform corpus never hits."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rsoup_spark.ops.relational import asof_join, range_join

# small keyspaces force collisions: equal timestamps across sides,
# multiple rows per key, keys present on only one side
_keys = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=-5, max_value=20)


@st.composite
def _asof_case(draw):
    left = draw(
        st.lists(st.tuples(_keys, _ts), min_size=0, max_size=12)
    )
    # right must be unique per (key, ts): the operator's contract
    right = draw(
        st.lists(st.tuples(_keys, _ts), min_size=0, max_size=12,
                 unique=True)
    )
    return left, right


@pytest.mark.spark
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_asof_case())
def test_asof_join_matches_duckdb_native(spark, case):
    left_rows, right_rows = case
    lpdf = pd.DataFrame(left_rows, columns=["k", "t"])
    lpdf["lid"] = range(len(lpdf))
    rpdf = pd.DataFrame(right_rows, columns=["k", "rt"])
    rpdf["v"] = [10 * k + (rt % 7) for k, rt in right_rows]

    ldf = spark.createDataFrame(
        lpdf if len(lpdf) else [], "k long, t long, lid long"
    )
    rdf = spark.createDataFrame(
        rpdf if len(rpdf) else [], "k long, rt long, v long"
    )
    got = sorted(
        (r.lid, r.v)
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="t", right_ts="rt",
            right_cols=["v"],
        ).collect()
    )

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    want = sorted(
        (lid, v)
        for lid, v in con.execute(
            "SELECT l.lid, r.v FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.rt"
        ).fetchall()
    )
    con.close()
    assert got == want


@st.composite
def _range_case(draw):
    points = draw(
        st.lists(st.integers(min_value=-10, max_value=30),
                 min_size=0, max_size=10)
    )
    # bounded width so max_bins_per_interval never trips (that path
    # has its own test); includes degenerate hi <= lo intervals
    intervals = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=-10, max_value=30),
                st.integers(min_value=-4, max_value=8),
            ),
            min_size=0,
            max_size=8,
        )
    )
    return points, intervals


@pytest.mark.spark
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_range_case())
def test_range_join_matches_duckdb_inequality(spark, case):
    points, intervals = case
    ppdf = pd.DataFrame({"p": points, "pid": range(len(points))})
    ipdf = pd.DataFrame(
        [(lo, lo + w, i) for i, (lo, w) in enumerate(intervals)],
        columns=["lo", "hi", "iid"],
    )

    pdf_s = spark.createDataFrame(
        ppdf if len(ppdf) else [], "p long, pid long"
    )
    idf_s = spark.createDataFrame(
        ipdf if len(ipdf) else [], "lo long, hi long, iid long"
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            pdf_s, idf_s, "p", "lo", "hi", bin_width=3.0
        ).collect()
    )

    con = duckdb.connect()
    con.register("p", ppdf)
    con.register("i", ipdf)
    want = sorted(
        con.execute(
            "SELECT p.pid, i.iid FROM p JOIN i "
            "ON i.lo <= p.p AND p.p < i.hi"
        ).fetchall()
    )
    con.close()
    assert got == want
