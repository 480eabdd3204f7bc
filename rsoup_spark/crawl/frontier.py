"""From-scratch distributed URL frontier + politeness scheduler.

North-rule semantics (BASELINE.json): extracted anchors are
canonicalized (RFC 3986 + lowercase host + strip fragment),
deduplicated against a partitioned Bloom URL-seen set sharded by
host-hash, and scheduled through a per-host politeness priority queue
(crawl-delay, robots allow/deny, score/depth priority).  State is
checkpointed per round with per-partition lineage + metrics so any run
resumes exactly.

Round algorithm (mirrored 1:1 by the oracle simulator in oracle.py --
crawl-order and seen-set equality are asserted in tests):

1. candidates = frontier |x| broadcast(robots); URLs whose path matches
   a disallow prefix are dropped for good (counted), unless an equally
   long or longer allow prefix matches (RFC 9309 longest-match-wins,
   allow winning ties; robots.py parses raw robots.txt to this form).
1b. (cfg.template_budget) per-(host, url-template) trap rationing
   against crawler traps (crawl/traps.py masking): templates whose
   lifetime schedule count is spent drop from the frontier for good
   (counted as n_template_blocked); live templates admit only their
   remaining budget's best-priority URLs this round, the rest stay
   queued.  Counts append to a tpl_counts log (O(batch) rows/round)
   folded + broadcast at round start.
2. per-host budget b = max(1, floor(round_seconds / crawl_delay)):
   rank per host by (score desc, depth asc, url asc), keep rank <= b.
3. global batch: order by (score desc, depth asc, url asc), limit
   batch_size -> the round's crawl order (deterministic total order;
   physical plan is TakeOrderedAndProject, no full sort materialized).
4. fetch scheduled URLs from the page store (left join on url).
5. harvest anchors from spans (Arrow UDF), canonicalize against the
   source URL, keep http(s), dedup within the round.
6. Bloom filter-and-insert per host-hash shard (partition-local), then
   exact anti-join of the FULL candidate set against the seen table --
   the correctness backstop that also recovers and counts Bloom false
   positives (cfg.exact_backstop; off at production scale).
7. new frontier entries: depth = min(parent depth)+1, score =
   max(parent score) * decay; frontier' = (allowed - scheduled) + new.

Shuffle budget per round: one window shuffle on host (politeness), one
repartition on shard_id (Bloom), one anti-join on url (backstop --
dropped at production scale where the Bloom is authoritative), the
top-k is a reduce.  Robots is always broadcast.  AQE handles skewed
hosts; host 0 in the fixture is deliberately 10x hot.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType
from pyspark.sql.window import Window

from .bloom import empty_shards, filter_and_update, with_shard_cols
from .cuckoo import empty_cuckoo_shards, filter_and_update_cuckoo
from .statestore import ParquetStateStore

DECAY = 0.85


@dataclass
class CrawlConfig:
    batch_size: int = 64
    round_seconds: float = 10.0
    max_rounds: int = 50
    n_shards: int = 64
    # which membership structure backs the URL-seen set (north_rule:
    # "bloom/cuckoo").  Bloom: smallest bits/key, no deletion, FPs only.
    # Cuckoo: supports deletion (TTL/recrawl), explicit capacity with
    # observable insert failures (n_failed per shard), 2-bucket lookups.
    seen_filter: str = "bloom"  # "bloom" | "cuckoo"
    m_bits: int = 1 << 20
    bloom_k: int = 5
    cuckoo_buckets: int = 1 << 12  # power of two; 4 slots each
    cuckoo_max_kicks: int = 500
    # frontier priority: "decay" = parent-score * DECAY (default);
    # "pagerank" = re-score the whole frontier each round from integer
    # PageRank over the discovered link graph (ops/graph.py).  Floor
    # division keeps every rank an exact integer, so the oracle
    # simulator reproduces the ordering bit-for-bit at any out-degree.
    score_mode: str = "decay"  # "decay" | "pagerank"
    pr_iters: int = 3
    host_salt_shards: int = 4  # sub-split hot hosts inside shuffles
    # exact seen anti-join after the bloom prefilter: recovers bloom
    # false positives (urls the bloom wrongly claims seen would
    # otherwise be silently lost).  At 10^10-url scale the bloom is
    # authoritative and this is turned off (accepting fp-rate loss).
    exact_backstop: bool = True
    # coalesce per-round state writes locally (small rounds produce
    # 32 tiny files per table otherwise); None = natural partitioning
    # (production: let output committers handle file sizing)
    checkpoint_coalesce: int | None = 8
    # per-(host, URL-template) crawl budget (crawler-trap rationing,
    # crawl/traps.py).  None = off.  When set, a URL whose template
    # has already been scheduled `template_budget` times across the
    # crawl is dropped permanently (counted as n_template_blocked);
    # within a round, only the remaining budget's best-priority URLs
    # per template are eligible, the rest stay queued.  Scheduled
    # counts append to a per-round `tpl_counts` log (O(batch) rows a
    # round), folded and BROADCAST at round start -- the template
    # table is bounded by site structure, never by page count.  Must
    # be set from init_state on (the counts log starts at round 1).
    template_budget: int | None = None
    # overlap the round's checkpoint writes (order/frontier/seen/
    # shards/lineage -> independent paths) with each other and with
    # the metrics job by submitting them as concurrent Spark jobs;
    # the manifest -- the round's atomic commit point -- is still
    # written only after every table write has completed, so the
    # crash-consistency contract is unchanged.  1 = sequential.
    checkpoint_threads: int = 4


def _canon_links(links: DataFrame) -> DataFrame:
    """(src_url, href) -> (url, host): canonical http(s) targets."""

    @F.pandas_udf(StringType())
    def canon(href: pd.Series, base: pd.Series) -> pd.Series:
        from ..functions.urlnorm import canonicalize_url

        return pd.Series(
            [canonicalize_url(h, b) or "" for h, b in zip(href, base)]
        )

    return (
        links.select(canon("href", "src_url").alias("url"),
                     F.col("src_url"))
        .where(F.col("url") != "")
    )


class CrawlEngine:
    """Iterative-batch crawl driver.

    Rounds are deterministic batch jobs (not Structured Streaming):
    crawl-order equality under a fixed seed list requires batch
    barriers a continuous trigger can't give (SURVEY.md §2.2).  Each
    round ends in one checkpoint = frontier/seen/shards/metrics
    parquet + a manifest; ``resume`` restarts from the last manifest.
    """

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame,
        ckpt_dir: str,
        config: CrawlConfig | None = None,
        store: ParquetStateStore | None = None,
    ) -> None:
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.ckpt = ckpt_dir
        # state store abstraction (north_rule: Iceberg checkpoints with
        # per-partition lineage): parquet-backed in the sandbox, the
        # IcebergStateStore implements the same interface for clusters
        # with the runtime jars
        self.store = store or ParquetStateStore(
            spark, ckpt_dir, coalesce=self.cfg.checkpoint_coalesce
        )
        self.pages = pages.select("url", "html")
        if "allow_prefixes" not in robots.columns:
            # structured-robots compatibility: no allow carve-outs
            robots = robots.withColumn(
                "allow_prefixes",
                F.array().cast("array<string>"),
            )
        robots = robots.withColumn(
            "budget",
            F.greatest(
                F.lit(1),
                F.floor(F.lit(self.cfg.round_seconds) / F.col("crawl_delay")),
            ).cast("int"),
        )
        self.robots = robots.persist()

    # -- state io -----------------------------------------------------------
    def _path(self, round_no: int, name: str) -> str:
        return self.store.path(round_no, name)

    # -- seen-filter dispatch (bloom | cuckoo, same cogroup contract) -------
    def _empty_shards(self) -> DataFrame:
        cfg = self.cfg
        if cfg.seen_filter == "cuckoo":
            return empty_cuckoo_shards(
                self.spark, cfg.n_shards, cfg.cuckoo_buckets
            )
        return empty_shards(self.spark, cfg.n_shards, cfg.m_bits)

    def _filter_update(self, cand: DataFrame, shards: DataFrame):
        cfg = self.cfg
        if cfg.seen_filter == "cuckoo":
            return filter_and_update_cuckoo(
                cand, shards, cfg.n_shards, cfg.cuckoo_buckets,
                cfg.cuckoo_max_kicks,
            )
        return filter_and_update(
            cand, shards, cfg.n_shards, cfg.m_bits, cfg.bloom_k
        )

    def init_state(self, seeds: DataFrame) -> None:
        os.makedirs(self.ckpt, exist_ok=True)
        frontier = seeds.select(
            "url",
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
            "depth",
            "score",
        )
        self.store.write(frontier, 0, "frontier")
        # the seen set is append-only: round r's dir holds only the urls
        # first discovered in round r, so each checkpoint writes O(new)
        # not O(total) -- at 10^10 urls this is the difference between a
        # snapshot append and rewriting the world every round (the
        # Iceberg production analogue is an append commit + MERGE)
        self.store.write(seeds.select("url"), 0, "seen")
        shards = self._empty_shards()
        # charge the seeds into the seen filter so rediscovered seeds dedup
        seed_cand = with_shard_cols(frontier, "url", "host", self.cfg.n_shards)
        _, shards, cached = self._filter_update(seed_cand, shards)
        self.store.write(shards, 0, "shards")
        if cached is not None:
            cached.unpersist()
        self.store.write_manifest(0, done=False)

    def _read_seen(self, up_to_round: int):
        """Union of the per-round seen appends (one multi-path scan).

        Once any expiry has happened (``expire``), membership becomes
        an event-log reduction: a URL is seen iff its latest add round
        is later than its latest expiry round -- so re-discovered
        expired URLs re-enter cleanly and double-expiry is idempotent.
        The plain-append fast path stays shuffle-free for the common
        no-expiry crawl.
        """
        if not self.store.has_log("expired", up_to_round):
            return self.store.read_log("seen", up_to_round)
        adds = (
            self.store.read_log_with_round("seen", up_to_round)
            .groupBy("url")
            .agg(F.max("round").alias("add_r"))
        )
        exps = (
            self.store.read_log_with_round("expired", up_to_round)
            .groupBy("url")
            .agg(F.max("round").alias("exp_r"))
        )
        return (
            adds.join(exps, "url", "left")
            .where(F.col("add_r") > F.coalesce(F.col("exp_r"), F.lit(-1)))
            .select("url")
        )

    def last_round(self) -> tuple[int, bool]:
        m = self.store.read_manifest()
        return m["round"], m["done"]

    # -- TTL / recrawl expiry ------------------------------------------------
    def expire(self, urls: DataFrame, reenqueue: bool = True,
               score: float | None = None) -> dict:
        """Between-rounds maintenance: forget ``urls`` (one ``url``
        column) from the seen set so the crawler revisits them.

        Mechanics per seen-filter backend:

        * ``cuckoo`` -- the URLs' fingerprints are physically deleted
          from the shards (partition-local cogroup pass), so recrawl
          works even in the production backstop-off mode where the
          filter is authoritative.
        * ``bloom`` -- bits cannot be cleared, so expiry rides entirely
          on the expired event log + the exact backstop anti-join; the
          filter's stale 'seen' claims surface as recovered false
          positives in the round metrics.  With the backstop off this
          combination cannot recrawl, so it raises.

        Either way the URL is appended to the ``expired`` log at the
        current round (``_read_seen`` then applies last-add-wins vs
        last-expiry-wins), and with ``reenqueue`` it re-enters the
        frontier at depth 0 with ``score`` so the politeness scheduler
        picks it up next round instead of waiting for organic
        rediscovery.  Resumable like everything else: both writes land
        in the current round's checkpoint before the method returns.
        """
        cfg = self.cfg
        if score is None:
            # 'seed priority' must mean it on both score scales: decay
            # scores are <= 1.0, but pagerank frontier scores are
            # >= 12**pr_iters // 2 -- a 1.0 default would sort victims
            # LAST in the next batch instead of first.
            score = (
                float(12 ** cfg.pr_iters)
                if cfg.score_mode == "pagerank"
                else 1.0
            )
        if cfg.seen_filter == "bloom" and not cfg.exact_backstop:
            raise ValueError(
                "bloom cannot delete: expiry needs exact_backstop=True "
                "or seen_filter='cuckoo'"
            )
        r, _ = self.last_round()
        victims = urls.select(
            "url",
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        ).persist()
        n = victims.count()
        # append: several expire() calls can land in the same round
        self.store.write(victims.select("url"), r, "expired",
                         mode="append")
        if cfg.seen_filter == "cuckoo":
            from .cuckoo import delete_and_update_cuckoo

            shards = self.store.read(r, "shards")
            vic = with_shard_cols(victims, "url", "host", cfg.n_shards)
            self.store.rewrite(
                delete_and_update_cuckoo(vic, shards, cfg.cuckoo_buckets),
                r,
                "shards",
            )
        if reenqueue:
            frontier = self.store.read(r, "frontier")
            merged = (
                frontier.unionByName(
                    victims.select(
                        "url",
                        "host",
                        F.lit(0).alias("depth"),
                        F.lit(score).alias("score"),
                    )
                )
                # a URL already in the frontier keeps its best priority
                .groupBy("url", "host")
                .agg(
                    F.min("depth").alias("depth"),
                    F.max("score").alias("score"),
                )
            )
            self.store.rewrite(merged, r, "frontier")
            # a finished crawl has work again: clear done so resume
            # runs; the current horizon carries through so a mid-window
            # expiry does not re-extend (run's extension rule)
            m = self.store.read_manifest()
            self.store.write_manifest(r, done=False,
                                      horizon=m.get("horizon"),
                                      snapshot=m.get("snapshot"))
        victims.unpersist()
        return {"round": r, "n_expired": n, "reenqueued": bool(reenqueue)}

    # -- one round -----------------------------------------------------------
    def run_round(self, r: int) -> dict:
        """Round r reads round r-1 state and writes round r state.

        Owns the concurrent-checkpoint pool lifecycle: if the round
        body fails mid-flight (executor loss, a failed write), the
        finally joins/cancels every in-flight writer before the error
        propagates -- otherwise a retry or resume of the same round
        would race orphaned writers against the same round-r paths.
        """
        from concurrent.futures import ThreadPoolExecutor

        pool = (
            ThreadPoolExecutor(max_workers=self.cfg.checkpoint_threads)
            if self.cfg.checkpoint_threads > 1
            else None
        )
        try:
            return self._run_round(r, pool)
        finally:
            if pool is not None:
                pool.shutdown(wait=True, cancel_futures=True)

    def _run_round(self, r: int, pool) -> dict:
        cfg = self.cfg
        t0 = time.time()
        frontier = self.store.read(r - 1, "frontier")
        seen = self._read_seen(r - 1)
        shards = self.store.read(r - 1, "shards")

        # concurrent checkpoint writer: each state table lands on its
        # own path, so the writes only serialize on cluster capacity,
        # not on each other; _flush() joins them all (re-raising any
        # failure) and MUST run before write_manifest -- the manifest
        # commits the round, so it cannot be allowed to observe a
        # partially-written table on crash.
        pending: list = []

        def _submit(df: DataFrame, name: str) -> None:
            if pool is None:
                self._write(df, r, name)
            else:
                pending.append(pool.submit(self._write, df, r, name))

        def _flush() -> None:
            for fut in pending:
                fut.result()
            pending.clear()

        # 1. robots gate (broadcast join; parse_url stays in codegen).
        # RFC 9309 longest-match-wins between allow and disallow with
        # allow winning ties ("least restrictive rule"): blocked iff
        # the longest matching disallow prefix is strictly longer than
        # the longest matching allow prefix (-1 = no match on a side).
        cand = frontier.join(F.broadcast(self.robots), "host", "left")
        path = F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("/"))

        def longest_match(col: str):
            return F.coalesce(
                F.array_max(
                    F.transform(
                        F.filter(
                            F.coalesce(col, F.array()),
                            lambda p: path.startswith(p),
                        ),
                        F.length,
                    )
                ),
                F.lit(-1),
            )

        blocked_cond = longest_match("disallow_prefixes") > longest_match(
            "allow_prefixes"
        )
        cand = cand.withColumn("blocked", blocked_cond).persist()
        allowed = cand.where(~F.col("blocked"))

        # 1b. per-template trap rationing (cfg.template_budget).  The
        # folded counts table is template-sized (bounded by site
        # structure) so it broadcasts; the admission rank windows on
        # (host, template) -- one extra shuffle, budget mode only.
        # Exhausted templates leave the frontier permanently (the trap
        # never drains); rank-overflow URLs stay queued because budget
        # is only consumed by ACTUAL schedules, which the batch limit
        # may cut below the admitted set.
        tpl_cache = None
        if cfg.template_budget is not None:
            from .traps import url_template

            _, tpl_expr, _ = url_template(F.col("url"))
            alw = allowed.withColumn("template", tpl_expr)
            if self.store.has_log("tpl_counts", r - 1):
                used = (
                    self.store.read_log("tpl_counts", r - 1)
                    .groupBy("host", "template")
                    .agg(F.sum("n_scheduled").alias("__used"))
                )
                alw = alw.join(
                    F.broadcast(used), ["host", "template"], "left"
                )
            else:
                alw = alw.withColumn("__used", F.lit(None).cast("long"))
            alw = alw.withColumn(
                "tused", F.coalesce("__used", F.lit(0)).cast("long")
            ).drop("__used").persist()
            tpl_cache = alw
            exhausted = alw.where(F.col("tused") >= cfg.template_budget)
            live = alw.where(F.col("tused") < cfg.template_budget)
            wt = Window.partitionBy("host", "template").orderBy(
                F.desc("score"), F.asc("depth"), F.asc("url")
            )
            admitted = (
                live.withColumn("trank", F.row_number().over(wt))
                .where(F.col("trank") <= cfg.template_budget
                       - F.col("tused"))
                .drop("trank", "template", "tused")
            )
            carry_allowed = live.drop("template", "tused")
        else:
            exhausted = None
            admitted = allowed
            carry_allowed = allowed

        # 2. per-host politeness budget, two-phase against hot-host skew:
        # pre-rank within (host, url-salt) sub-partitions, keep the
        # per-salt top-budget (a superset of the per-host top-budget),
        # then the per-host rank sorts only salt*budget rows per host
        budget = F.coalesce("budget", F.lit(1))
        w1 = Window.partitionBy("host", "salt").orderBy(
            F.desc("score"), F.asc("depth"), F.asc("url")
        )
        w2 = Window.partitionBy("host").orderBy(
            F.desc("score"), F.asc("depth"), F.asc("url")
        )
        eligible = (
            admitted.withColumn(
                "salt",
                F.pmod(F.xxhash64("url"), F.lit(cfg.host_salt_shards)),
            )
            .withColumn("pre_rank", F.row_number().over(w1))
            .where(F.col("pre_rank") <= budget)
            .withColumn("host_rank", F.row_number().over(w2))
            .where(F.col("host_rank") <= budget)
        )

        # 3. global deterministic batch (top-k, not a full sort)
        scheduled = (
            eligible.orderBy(F.desc("score"), F.asc("depth"), F.asc("url"))
            .limit(cfg.batch_size)
            .select("url", "host", "depth", "score")
            .persist()
        )
        # NOTE: the unpartitioned window below intentionally runs on a
        # single partition -- its input is the already-limited batch
        # (<= cfg.batch_size rows), and the crawl-order contract needs
        # one global, deterministic rank.  Do not "fix" the WindowExec
        # warning by partitioning; that would break order equality.
        order_df = scheduled.orderBy(
            F.desc("score"), F.asc("depth"), F.asc("url")
        ).select(
            F.lit(r).alias("round"),
            F.row_number()
            .over(
                Window.orderBy(F.desc("score"), F.asc("depth"), F.asc("url"))
            )
            .alias("rank"),
            "url",
            "host",
            "depth",
            "score",
        )
        _submit(order_df, "order")  # overlaps with fetch/harvest below

        if cfg.template_budget is not None:
            # append this round's per-template schedule counts
            # (<= batch_size rows): the budget is consumed by actual
            # schedules only, so next round's fold sees exact usage
            from .traps import url_template as _ut

            _, tpl_expr_s, _ = _ut(F.col("url"))
            inc = (
                scheduled.withColumn("template", tpl_expr_s)
                .groupBy("host", "template")
                .agg(F.count("*").cast("long").alias("n_scheduled"))
            )
            _submit(inc, "tpl_counts")

        # 4.-5. fetch + harvest + canonicalize (one fused Python pass)
        from ..operators.extract import harvest_canonical_links

        fetched = scheduled.join(self.pages, "url", "left").persist()
        canon = harvest_canonical_links(
            fetched.where(F.col("html").isNotNull()), "url", "html"
        )

        # per-URL aggregation in the JVM: map-side partial agg shrinks
        # the shuffle ~8:1 before anything reaches Python.  (Folding the
        # dedup into the bloom pass via dedup_key was measured slower --
        # it feeds every raw contribution row through pandas.)
        parent = scheduled.select(
            F.col("url").alias("src_url"),
            F.col("depth").alias("p_depth"),
            F.col("score").alias("p_score"),
        )
        contrib = (
            canon.join(parent, "src_url")
            .groupBy("url")
            .agg(
                (F.min("p_depth") + 1).cast("int").alias("depth"),
                F.round(F.max("p_score") * DECAY, 9).alias("score"),
            )
            .withColumn(
                "host", F.regexp_extract("url", r"^https?://([^/]+)", 1)
            )
            .persist()
        )

        # 6. bloom dedup (partition-local per shard); the cogroup
        # provides its own exchange on shard_id.  probably_new is the
        # bloom-negative subset -- always truly unseen (no false
        # negatives), but the bloom's false POSITIVES are urls it
        # wrongly claims seen: without the exact backstop they are
        # silently lost.  The backstop anti-joins the full candidate
        # set against seen, so new_urls is exact and the fp count is
        # observable as n_new - n_bloom_new (probably_new ⊆ new_urls).
        cand_new = with_shard_cols(contrib, "url", "host", cfg.n_shards)
        if self.store.has_log("expired", r - 1):
            # recrawl path: an expired victim scheduled THIS round is
            # absent from round r-1's seen set, so a same-round link to
            # it would re-admit it as "new" and crawl it twice (the
            # cuckoo backend physically forgot its fingerprint, so the
            # filter cannot catch it either).  This round's scheduled
            # set is the missing piece of "seen as of now"; in a plain
            # crawl scheduled ⊆ seen makes this anti-join a waste.
            cand_new = cand_new.join(
                scheduled.select("url"), "url", "left_anti"
            )
        probably_new, new_shards, bloom_cache = self._filter_update(
            cand_new, shards
        )
        probably_new = probably_new.persist()
        if cfg.exact_backstop:
            new_urls = (
                cand_new.select("url", "host", "depth", "score")
                .join(seen, "url", "left_anti")
                .persist()
            )
        else:
            # production path: bloom is authoritative (fp-rate loss
            # accepted); the seen anti-join shuffle disappears
            new_urls = probably_new.select(
                "url", "host", "depth", "score"
            ).persist()

        # 7. next state (writes also populate the caches the metrics
        # job reads below)
        next_frontier = (
            carry_allowed.join(scheduled.select("url"), "url", "left_anti")
            .select("url", "host", "depth", "score")
            .unionByName(new_urls)
        )
        if self.store.has_log("expired", r - 1):
            # after an expiry, a re-enqueued URL can ALSO be organically
            # rediscovered before it gets scheduled (it is no longer in
            # seen), putting it in both union branches -- collapse to
            # the best priority.  Expiry-only: the plain crawl's union
            # branches are disjoint by the seen anti-join, so the extra
            # shuffle would be waste there.
            next_frontier = next_frontier.groupBy("url", "host").agg(
                F.min("depth").alias("depth"),
                F.max("score").alias("score"),
            )
        if cfg.score_mode == "pagerank":
            # re-score the carried-over frontier from integer PageRank
            # over the edges discovered so far (appended per round,
            # read as one log -- O(new) writes like the seen set).
            # Next round's politeness/batch ordering uses these scores;
            # the oracle simulator mirrors the arithmetic exactly.
            from ..ops.graph import pagerank_int

            edges_r = canon.select(
                F.col("src_url").alias("src"), F.col("url").alias("dst")
            ).distinct()
            self._write(edges_r, r, "edges")
            # distinct across rounds, not just within: after expire() a
            # re-scheduled URL re-harvests its out-links into a later
            # round's log, and duplicate (src,dst) rows would double
            # outdeg and contributions (breaking the outdeg<=3
            # integer-exactness bound).  The oracle accumulates edges
            # as a set; mirror it.
            all_edges = self.store.read_log("edges", r).distinct()
            nodes = (
                all_edges.select(F.col("src").alias("id"))
                .unionByName(all_edges.select(F.col("dst").alias("id")))
                .unionByName(next_frontier.select(F.col("url").alias("id")))
                .distinct()
            )
            pr = pagerank_int(nodes, all_edges, cfg.pr_iters).select(
                F.col("id").alias("url"), "pr_scaled"
            )
            base = float(12 ** cfg.pr_iters // 2)
            next_frontier = next_frontier.join(pr, "url", "left").select(
                "url",
                "host",
                "depth",
                F.coalesce(F.col("pr_scaled").cast("double"), F.lit(base))
                .alias("score"),
            )
        _submit(next_frontier, "frontier")
        # append-only seen: only this round's new urls are written
        new_seen = new_urls.select("url")
        resched_cache = None
        if self.store.has_log("expired", r - 1):
            # recrawl path: an expired URL re-enqueued by expire() is
            # scheduled while absent from seen -- crawling it re-seens
            # it even when no surviving page links to it.  Expiry-only
            # branch; in a plain crawl scheduled ⊆ seen always.
            rescheduled = scheduled.join(seen, "url", "left_anti")
            new_seen = new_seen.unionByName(
                rescheduled.select("url")
            ).distinct()
            if cfg.seen_filter == "cuckoo":
                # the victim's fingerprint was physically deleted by
                # expire(), and the recrawl anti-join keeps it out of
                # cand_new in its own scheduling round -- so in
                # the production backstop-off mode, where the filter IS
                # the seen set, a later-round link would re-admit it as
                # probably_new and crawl it twice.  Re-insert the
                # round's scheduled-but-unseen fingerprints (<= one
                # batch of rows, expiry rounds only).  Bloom needs no
                # pass: its bits were never cleared.
                resched_cand = with_shard_cols(
                    rescheduled, "url", "host", cfg.n_shards
                )
                _, new_shards, resched_cache = self._filter_update(
                    resched_cand, new_shards
                )
        _submit(new_seen, "seen")
        _submit(new_shards, "shards")

        # per-partition lineage: which partition produced how many
        # scheduled rows (north_rule: per-partition lineage + metrics)
        lineage = (
            scheduled.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("urls_scheduled"))
            .withColumn("round", F.lit(r))
        )
        _submit(lineage, "lineage")

        # one metrics job: every branch is persisted, so this is seven
        # single-row aggregates over caches instead of seven actions;
        # it runs on the driver thread while the checkpoint writes are
        # still in flight on the pool
        def _c(name: str, df: DataFrame) -> DataFrame:
            return df.agg(F.count("*").cast("long").alias("v")).select(
                F.lit(name).alias("k"), "v"
            )

        counts_df = (
            _c("candidates", cand)
            .unionByName(_c("blocked", cand.where("blocked")))
            .unionByName(_c("scheduled", scheduled))
            .unionByName(
                _c("fetched", fetched.where(F.col("html").isNotNull()))
            )
            .unionByName(_c("discovered", contrib))
            .unionByName(_c("bloom_new", probably_new))
            .unionByName(_c("new", new_urls))
        )
        if exhausted is not None:
            counts_df = counts_df.unionByName(
                _c("tpl_blocked", exhausted)
            )
        vals = {row["k"]: row["v"] for row in counts_df.collect()}  # bounded

        # join every in-flight checkpoint write BEFORE the manifest
        # commit (and before the expiry branch below re-reads the
        # just-written frontier table); wall_ms therefore still
        # covers the full round including checkpoint I/O
        _flush()

        metrics = {
            "round": r,
            "seen_filter": cfg.seen_filter,
            "n_candidates": vals["candidates"],
            "n_blocked": vals["blocked"],
            "n_scheduled": vals["scheduled"],
            "n_fetched": vals["fetched"],
            "n_discovered": vals["discovered"],
            "n_bloom_new": vals["bloom_new"],
            "n_new": vals["new"],
            # urls the seen filter wrongly claimed seen, recovered by
            # the exact backstop (None when the backstop is off:
            # without the exact join the loss is unobservable).  For
            # the cuckoo filter a NEGATIVE value is possible in the
            # overflow regime: a URL whose insert failed earlier reads
            # unseen again when rediscovered (a false negative -> re-
            # crawl, never a loss); shard n_failed makes that state
            # observable directly.
            "bloom_false_positives": (
                vals["new"] - vals["bloom_new"]
                if cfg.exact_backstop else None
            ),
            # urls dropped for good because their template's budget is
            # spent (None when template rationing is off)
            "n_template_blocked": vals.get("tpl_blocked"),
            "wall_ms": int((time.time() - t0) * 1000),
        }
        with open(self._path(r, "metrics.json"), "w") as f:
            json.dump(metrics, f)
        if self.store.has_log("expired", r - 1):
            # recrawl rounds invalidate the derived arithmetic: the
            # post-expiry groupBy merge collapses duplicate frontier
            # rows and the seen append includes rescheduled victims --
            # count the tables actually written (tiny parquet reads,
            # expiry rounds only)
            frontier_rows = self.store.read(r, "frontier").count()
            seen_appended = self.store.read(r, "seen").count()
        else:
            frontier_rows = (
                metrics["n_candidates"]
                - metrics["n_blocked"]
                - (metrics["n_template_blocked"] or 0)
                - metrics["n_scheduled"]
                + metrics["n_new"]
            )
            seen_appended = metrics["n_new"]
        self.store.write_manifest(
            r,
            done=metrics["n_scheduled"] == 0,
            horizon=getattr(self, "_horizon", None) or self.cfg.max_rounds,
            snapshot={
                "tables": {
                    "order": {"rows": metrics["n_scheduled"]},
                    "seen": {"rows_appended": seen_appended},
                    "frontier": {"rows": frontier_rows},
                    "shards": {"rows": cfg.n_shards},
                },
                "lineage": self._path(r, "lineage"),
            },
        )

        for df in (cand, scheduled, fetched, contrib, probably_new,
                   new_urls, bloom_cache, resched_cache, tpl_cache):
            if df is not None:
                df.unpersist()
        return metrics

    def _write(self, df: DataFrame, round_no: int, name: str) -> None:
        self.store.write(df, round_no, name)

    # -- driver loop ----------------------------------------------------------
    def run(self, seeds: DataFrame | None = None,
            resume: bool = False) -> list[dict]:
        if resume:
            start, done = self.last_round()
            if done:
                return []
            # the crawl's CURRENT round horizon travels in the manifest
            # (written by every round): a resume inside an already-
            # extended window must keep that window's end, not reset to
            # cfg.max_rounds -- otherwise a mid-window resume at
            # start >= cfg.max_rounds would re-extend and diverge from
            # the oracle, which only extends when r >= its current end.
            end = self.store.read_manifest().get(
                "horizon", self.cfg.max_rounds
            ) or self.cfg.max_rounds
        else:
            assert seeds is not None, "fresh run needs seeds"
            self.init_state(seeds)
            start = 0
            end = self.cfg.max_rounds
        # a post-expiry resume always gets rounds to run, even when
        # expire() re-enqueued at the round cap (start == horizon
        # would otherwise make the range empty and silently never
        # recrawl the victims): extend the horizon by another
        # max_rounds window past the cap.  Gated on an expiry logged
        # AT the current round -- i.e. expire() ran after the crawl
        # stopped here -- NOT merely anywhere in the log: any ancient
        # expiry would otherwise extend every later capped resume
        # forever (unbounded crawl).  A plain capped crawl keeps its
        # cap, and an ordinary mid-window resume (start < end) keeps
        # the current window so a resumed crawl stays round-for-round
        # equal to an uninterrupted one (oracle.simulate's rule).
        if start >= end and self.store.exists(start, "expired"):
            end = start + self.cfg.max_rounds
        self._horizon = end
        history = []
        for r in range(start + 1, end + 1):
            m = self.run_round(r)
            history.append(m)
            if m["n_scheduled"] == 0:
                break
        return history

    # -- results -------------------------------------------------------------
    def crawl_order(self) -> list[tuple[int, int, str]]:
        last, _ = self.last_round()
        out = []
        for r in range(1, last + 1):
            p = self._path(r, "order")
            if not os.path.exists(p):
                continue
            rows = (
                self.spark.read.parquet(p)
                .orderBy("round", "rank")
                .select("round", "rank", "url")
                .collect()  # test-only surface: oracle-equality checks
            )
            out.extend((row["round"], row["rank"], row["url"]) for row in rows)
        return out

    def seen_set(self) -> set[str]:
        last, _ = self.last_round()
        # test-only surface: oracle-equality checks
        return {r["url"] for r in self._read_seen(last).collect()}
