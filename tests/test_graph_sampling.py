"""Graph PageRank (integer-exact) and deterministic stratified
sampling: hand-computed goldens + the determinism contracts the gate
oracles rely on."""

import pytest
from pyspark.sql import functions as F

from rsoup_spark.ops.graph import PR_SCALE, pagerank_int
from rsoup_spark.ops.sampling import sample_bucket, stratified_sample


@pytest.mark.spark
def test_pagerank_hand_computed(spark):
    """3-cycle-with-chord graph, 3 iterations, d=1/2, scale 1728:
    worked by hand --
      R1 = [1728, 1296, 2160]
      R2 = [1944, 1296, 1944]
      R3 = [1836, 1350, 1998]
    plus an isolated node that stays at the base term 864."""
    nodes = spark.createDataFrame([(0,), (1,), (2,), (3,)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0)], "src long, dst long"
    )
    got = {
        r["id"]: (r["pr_scaled"], r["pr"])
        for r in pagerank_int(nodes, edges).collect()
    }
    assert got[0][0] == 1836
    assert got[1][0] == 1350
    assert got[2][0] == 1998
    assert got[3][0] == 864
    assert got[2][1] == round(1998 / PR_SCALE, 6)


@pytest.mark.spark
def test_pagerank_all_integral_and_deterministic(spark):
    """Over the gate's synthetic edge shape every rank is integral
    (the exactness invariant) and rank order favors high in-degree."""
    n = 200
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = (
        nodes.select(
            F.col("id").alias("src"),
            F.explode(
                F.array(F.col("id") + 1, F.col("id") + 3, F.col("id") + 7)
            ).alias("dst"),
        )
        .join(nodes.select(F.col("id").alias("dst")), "dst")
    )
    a = sorted(
        (r["id"], r["pr_scaled"]) for r in pagerank_int(nodes, edges).collect()
    )
    b = sorted(
        (r["id"], r["pr_scaled"]) for r in pagerank_int(nodes, edges).collect()
    )
    assert a == b  # replay-deterministic
    ranks = dict(a)
    # ids 0..6 miss some in-edges (no i-1/i-3/i-7 sources); interior
    # nodes with full in-degree rank above the base term
    assert all(v >= PR_SCALE // 2 for v in ranks.values())
    assert ranks[100] > PR_SCALE // 2


@pytest.mark.spark
def test_stratified_sample_contracts(spark):
    rows = [(i, f"s{i % 4}") for i in range(8000)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = stratified_sample(
        df, "stratum", {"s0": 1.0, "s1": 0.5, "s2": 0.0}, default_rate=0.1,
        id_col="doc_id",
    )
    got = out.groupBy("stratum").count().collect()
    counts = {r["stratum"]: r["count"] for r in got}
    assert counts["s0"] == 2000          # rate 1.0 keeps everything
    assert "s2" not in counts            # rate 0.0 keeps nothing
    assert abs(counts["s1"] - 1000) < 120   # hash-bernoulli ~0.5
    assert abs(counts.get("s3", 0) - 200) < 60  # default 0.1
    # determinism: the kept id set is a pure function of the inputs
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert ids1 == ids2
    # survivors of a higher-rate run are a superset (nested samples:
    # threshold monotonicity, the property that makes rate ramps safe)
    wider = stratified_sample(
        df, "stratum", {"s1": 0.8}, default_rate=0.0, id_col="doc_id"
    )
    ids_wide = {r["doc_id"] for r in wider.select("doc_id").collect()}
    ids_narrow = {i for i in ids1 if i % 4 == 1}
    assert ids_narrow <= ids_wide


@pytest.mark.spark
def test_sample_bucket_matches_duckdb(spark):
    """The Spark bucket expression and the oracle SQL construction
    agree value-for-value (md5 -> first 8 hex -> int % granularity)."""
    import duckdb

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", sample_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT i, (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8))"
            "::UBIGINT % 10000)::BIGINT FROM range(300) t(i)"
        ).fetchall()
    )
    assert got == want


@pytest.mark.spark
def test_anchor_text_agg_hand_computed(spark):
    """Hub target with boilerplate anchors: dominance, lexicographic
    tie-break, the max_anchors cap, and distinct-source counting
    (one source linking twice counts once in n_sources, twice in
    n_inlinks)."""
    from rsoup_spark.ops.graph import anchor_text_agg

    edges = spark.createDataFrame(
        [
            # hub "T": 3x "home", 2x "start", 1x "портал" -- six
            # in-links from five sources (s1 links twice)
            ("s1", "T", "home"),
            ("s1", "T", "home"),
            ("s2", "T", "home"),
            ("s3", "T", "start"),
            ("s4", "T", "start"),
            ("s5", "T", "портал"),
            # "U": a pure count tie -- lexicographic ascending wins
            ("s1", "U", "beta"),
            ("s2", "U", "alpha"),
        ],
        "src string, dst string, anchor string",
    )
    got = {
        r["dst"]: r for r in anchor_text_agg(edges, max_anchors=2).collect()
    }
    t = got["T"]
    assert (t["n_inlinks"], t["n_sources"], t["n_anchors"]) == (6, 5, 3)
    assert t["top_anchor"] == "home"
    # cap binds: only the top two of the three anchors survive,
    # ordered (count desc, anchor asc)
    assert t["anchors"] == "home|start"
    u = got["U"]
    assert u["top_anchor"] == "alpha"
    assert u["anchors"] == "alpha|beta"


@pytest.mark.spark
def test_anchor_text_agg_plan_shape(spark):
    """The skew guard: the (dst, anchor) pre-aggregation carries a
    map-side partial before the shuffle, and no Python UDF appears
    anywhere in the plan."""
    from rsoup_spark.ops.graph import anchor_text_agg

    edges = spark.createDataFrame(
        [("a", "t", "x")], "src string, dst string, anchor string"
    )
    plan = anchor_text_agg(edges)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
