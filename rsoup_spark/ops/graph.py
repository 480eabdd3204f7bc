"""Link-graph analytics for crawl prioritization.

From-scratch (no reference counterpart -- rsoup has no graph ops; the
crawl graft's frontier priority is the consumer).  The headline op is
an exactly-checkable PageRank: a frontier that schedules by link-graph
importance instead of parent-score decay needs PR over the discovered
edge list, and at 10^10 URLs that is the classic iterative
join+aggregate dataflow -- each iteration one equi-join ranks-to-edges
plus one groupBy(dst) sum, both map-side combinable, no driver state.

Exactness trick: damping d = 1/2 and ranks scaled by lcm(2*deg)^k
keep every intermediate an INTEGER when out-degrees are bounded by 3
(the gate's synthetic graph), so Spark and a SQL oracle agree
bit-for-bit -- no float summation-order hazard.  For real graphs
(unbounded degree) the same dataflow runs in float64; the gate pins
the dataflow's correctness, the float path only changes the cell type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scale = lcm(2*1, 2*2, 2*3) = 12 per iteration; 3 iterations
PR_ITERS = 3
PR_SCALE = 12 ** PR_ITERS  # 1728


def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = PR_ITERS,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer-exact PageRank with damping 1/2 over a bounded-degree
    graph: rank' = (1-d) + d * sum(rank_u / outdeg_u) over in-edges,
    all values scaled by ``12**iters`` so every division is exact
    (requires outdeg <= 3; asserted by construction in the gate).

    Returns (id, pr_scaled: long, pr: double) where pr = pr_scaled /
    12**iters.  Dangling nodes receive the base term only; nodes with
    no in-edges likewise.  One join + one aggregate per iteration --
    the 100 TB shape (both shuffles on the same key can reuse a
    partitioning; AQE handles skewed in-degree hubs).
    """
    scale = 12 ** iters
    # the node table is read iters+1 times (initial ranks + each
    # round's dangling-node left join); materialize the tiny (id)
    # projection once instead of re-running its source subtree per
    # reference (same rationale as the edge checkpoint below)
    n = nodes.select(F.col(id_col).alias("id")).localCheckpoint()
    # the edge list (with out-degrees attached once, not re-joined per
    # round) is read every iteration: checkpoint it so each round's
    # plan starts from the materialized edges instead of re-embedding
    # (and re-running) the edge-construction subtree `iters` times
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint()
    ranks = n.withColumn("pr_scaled", F.lit(int(scale)).cast("long"))
    base = scale // 2  # (1-d) * scale with d = 1/2
    for _ in range(iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            # integer div; exact because pr_scaled at depth t is
            # divisible by 12^(iters-t) and 2*outdeg divides 12
            .select(
                F.col("dst").alias("id"),
                F.expr("pr_scaled DIV (2 * outdeg)").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            n.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.coalesce(F.col("in_sum"), F.lit(0)))
                .cast("long")
                .alias("pr_scaled"),
            )
        )
    return ranks.select(
        "id",
        "pr_scaled",
        F.round(F.col("pr_scaled") / F.lit(float(scale)), 6).alias("pr"),
    )


def anchor_text_agg(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    max_anchors: int = 16,
    sep: str = "|",
) -> DataFrame:
    """Per-target anchor-text aggregation over a harvested link graph
    -- the classic web-IR signal (anchor text describes the *target*
    page better than the target's own text) and a training-data
    labeler for crawled corpora.  From-scratch: rsoup harvests
    ``(href, anchor)`` pairs (models/rich_text cell links) but has no
    cross-document aggregation; this is the crawl graft's consumer of
    ``links_from_spans`` output after URL canonicalization.

    For each distinct target URL: total in-link count, distinct
    source count, distinct anchor-string count, the dominant anchor
    (most frequent, ties broken lexicographically ascending -- fully
    deterministic), and the top ``max_anchors`` anchors joined by
    ``sep`` in (count desc, anchor asc) order.

    Scale shape: the first aggregation keys on (dst, anchor) with
    map-side partial combine, so a hub URL with millions of in-links
    carrying boilerplate anchors ("home", "click here") collapses to
    its distinct-anchor cardinality before the shuffle; the anchor
    list is capped at ``max_anchors`` so output rows stay bounded no
    matter how adversarial the anchor diversity (the same bounded-
    output discipline as jaccard_pairs' df cap).  The distinct-source
    count is a second shuffle on the same dst key.  No collects, no
    Python in the hot path -- struct-ordering min() picks the
    dominant anchor JVM-side.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(anchor_col).alias("anchor"),
    )
    # (dst, anchor) partial counts: the skew-killing pre-aggregation
    pa = e.groupBy("dst", "anchor").agg(
        F.count("*").cast("long").alias("cnt")
    )
    # negated count makes lexicographic struct ordering = (count
    # desc, anchor asc), so min()/array_sort() are deterministic
    ranked = pa.select(
        "dst",
        "cnt",
        F.struct(
            (-F.col("cnt")).alias("nc"), F.col("anchor").alias("a")
        ).alias("key"),
    )
    agg = ranked.groupBy("dst").agg(
        F.sum("cnt").alias("n_inlinks"),
        F.count("*").alias("n_anchors"),
        F.min("key").getField("a").alias("top_anchor"),
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(F.collect_list("key")), 1, max_anchors
                ),
                lambda x: x.getField("a"),
            ),
            sep,
        ).alias("anchors"),
    )
    srcs = (
        e.select("dst", "src")
        .distinct()
        .groupBy("dst")
        .agg(F.count("*").alias("n_sources"))
    )
    return agg.join(srcs, "dst").select(
        "dst", "n_inlinks", "n_sources", "n_anchors", "top_anchor",
        "anchors",
    )


def resolve_aliases(
    edges: DataFrame,
    max_hops: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Redirect / rel=canonical alias-chain resolution -- the crawl
    step between link harvesting and dedup: every alias URL (HTTP 3xx
    source, <link rel=canonical> page) is resolved to the terminal URL
    its chain reaches, so the URL-seen set and the dedup keys operate
    on canonical identities instead of counting each hop as a fresh
    page.  From-scratch: rsoup follows single fetches only
    (rsoup/src/lib.rs fetch_tables has no redirect-graph state); a
    10^10-URL frontier needs chain resolution as a dataflow.

    Semantics (the crawler contract, not transitive closure): each
    src maps to ONE next URL (duplicate edges collapse to min(dst),
    deterministically); chains are followed up to ``max_hops`` hops.
    A chain that reaches a URL with no outgoing edge within the
    budget resolves there (status 'ok'); one still mid-chain at the
    cap -- a redirect loop or an over-long chain, exactly what real
    fetchers abort with ERR_TOO_MANY_REDIRECTS -- yields resolved =
    NULL, status 'capped'.  Hop counts are exact chain lengths.

    Scale shape: pointer doubling, not per-hop walking -- round k
    composes the (src -> node after <= 2^k hops, exact hops, done)
    mapping with itself via one left equi-join on the current node,
    so the shuffle count is ceil(log2(max_hops)) + 1, never
    max_hops, and each join keys on the URL (AQE handles hub skew).
    No driver state beyond the loop counter.  Each round's state is
    local-checkpointed (eager): the state feeds the next round twice
    (probe and build side of the self-composition), so checkpointing
    computes it once, keeps every round's plan O(1) instead of
    re-embedding the doubled lineage (guide §3.3), and leaves no
    persisted frames behind (the round-5 version leaked
    log2(max_hops)+1 cached DataFrames per call).
    """
    m = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
        .localCheckpoint()
    )
    # state: src -> (cur node after `hops` real hops, done = cur has
    # no outgoing edge).  Initial state is the one-hop mapping.
    state = m.select(
        "src",
        F.col("dst").alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    )
    hop = m.select(
        F.col("src").alias("cur"),
        F.col("dst").alias("nxt"),
    )
    rounds = max(1, (max_hops - 1).bit_length())
    for _ in range(rounds):
        # advance pending chains by up to 2^k more hops: join the
        # state to itself through the doubled mapping.  A miss on the
        # join means cur is terminal (done); a hit past the cap stays
        # pending and is classified after the loop.
        nxt = state.select(
            F.col("src").alias("cur"),
            F.col("cur").alias("cur2"),
            F.col("hops").alias("hops2"),
        )
        state = (
            state.join(nxt, "cur", "left")
            .select(
                "src",
                F.coalesce("cur2", "cur").alias("cur"),
                (
                    F.col("hops")
                    + F.coalesce(F.col("hops2"), F.lit(0))
                ).alias("hops"),
            )
            .localCheckpoint()
        )
    # terminal iff cur has no outgoing edge AND the chain fit the cap
    out = (
        state.join(
            hop.select(F.col("cur"), F.lit(True).alias("has_out")),
            "cur",
            "left",
        )
        .select(
            "src",
            F.when(
                F.col("has_out").isNull() & (F.col("hops") <= max_hops),
                F.col("cur"),
            ).alias("resolved"),
            F.when(
                F.col("has_out").isNull() & (F.col("hops") <= max_hops),
                F.col("hops"),
            ).alias("hops"),
            F.when(
                F.col("has_out").isNull() & (F.col("hops") <= max_hops),
                F.lit("ok"),
            )
            .otherwise(F.lit("capped"))
            .alias("status"),
        )
    )
    return out
