"""TTL/recrawl expiry: forget seen URLs, revisit them, stay resumable.

Covers the event-log seen semantics (last add vs last expiry), the
physical cuckoo fingerprint deletion, the bloom+backstop logical path,
and the unsupported bloom-authoritative combination.
"""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from rsoup_spark.crawl.fixtures import gen_pages, gen_robots, gen_seeds
from rsoup_spark.crawl.frontier import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def web(spark):
    pages = gen_pages(
        spark, n_hosts=4, base_pages=6, hot_factor=4, links_per_page=5,
        seed=77,
    ).persist()
    pages.count()
    return pages, gen_robots(spark, n_hosts=4), gen_seeds(spark, n_hosts=4)


def _run_to_done(spark, web, cfg, tmp):
    pages, robots, seeds = web
    eng = CrawlEngine(spark, pages, robots, tmp, cfg)
    eng.run(seeds=seeds)
    return eng


def _expire_and_resume(spark, eng, k=4):
    seen_before = eng.seen_set()
    victims = sorted(u for _r, _k, u in eng.crawl_order())[:k]
    info = eng.expire(
        eng.spark.createDataFrame([(u,) for u in victims], "url string")
    )
    assert info["n_expired"] == k
    assert set(victims) <= seen_before
    # logically forgotten
    assert not (set(victims) & eng.seen_set())
    # resumable: the re-enqueued URLs get scheduled again
    r0 = info["round"]
    eng.run(resume=True)
    rescheduled = {
        u for r, _k, u in eng.crawl_order() if r > r0 and u in set(victims)
    }
    assert rescheduled == set(victims)
    return victims, r0


@pytest.mark.spark
def test_cuckoo_expiry_recrawls(spark, web):
    cfg = CrawlConfig(batch_size=16, max_rounds=14, n_shards=8,
                      seen_filter="cuckoo", cuckoo_buckets=1 << 10)
    tmp = tempfile.mkdtemp(prefix="recrawl_ck_")
    try:
        eng = _run_to_done(spark, web, cfg, tmp)
        n_before = sum(
            r["n_items"]
            for r in eng.store.read(eng.last_round()[0], "shards").collect()
        )
        victims, r0 = _expire_and_resume(spark, eng)
        # fingerprints physically deleted at the expiry checkpoint:
        # n_items dropped by exactly the victim count
        from rsoup_spark.crawl.bloom import with_shard_cols
        from rsoup_spark.crawl.cuckoo import SLOTS, cuckoo_contains

        shard_rows = eng.store.read(r0, "shards").collect()
        # resume re-inserts rediscovered victims in later rounds, so
        # assert against the round-r0 snapshot written by expire()
        assert sum(r["n_items"] for r in shard_rows) == n_before - len(victims)
        tables = {
            r["shard_id"]: np.frombuffer(r["cuckoo"], np.uint16)
            .reshape(-1, SLOTS)
            for r in shard_rows
        }
        vic_df = spark.createDataFrame(
            [(u, u.split("/")[2]) for u in victims], "url string, host string"
        )
        for row in with_shard_cols(
            vic_df, "url", "host", cfg.n_shards
        ).collect():
            h = np.array([row["url_hash"]], np.int64)
            assert not cuckoo_contains(tables[row["shard_id"]], h)[0], row
        # after the resumed crawl rediscovers them, they are seen again
        assert set(victims) <= eng.seen_set()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.spark
def test_bloom_expiry_rides_the_backstop(spark, web):
    """Expire a parent page plus three of its same-host out-links with a
    1-fetch/round politeness budget: the recrawled parent rediscovers
    still-unseen victims in LATER rounds, so the bloom's stale 'seen'
    claims surface as recovered false positives -- while no victim is
    ever scheduled twice (a victim rediscovered in its own scheduling
    round is deduped against the round's scheduled set)."""
    import json
    from collections import Counter
    from urllib.parse import urlsplit

    cfg = CrawlConfig(batch_size=16, max_rounds=14, n_shards=8,
                      m_bits=1 << 16, round_seconds=1.0)
    tmp = tempfile.mkdtemp(prefix="recrawl_bl_")
    try:
        eng = _run_to_done(spark, web, cfg, tmp)
        seen_before = eng.seen_set()
        pages = web[0]
        parent, kids = None, None
        for row in pages.select("url", "out_links").collect():
            u = row["url"]
            if u not in seen_before:
                continue
            host = urlsplit(u).netloc
            outs = [
                o for o in row["out_links"]
                if o in seen_before and o != u
                and urlsplit(o).netloc == host
            ]
            if len(outs) >= 3:
                parent, kids = u, sorted(outs)[:3]
                break
        assert parent is not None, "fixture lost its linked cluster"
        victims = [parent] + kids
        info = eng.expire(
            spark.createDataFrame([(u,) for u in victims], "url string")
        )
        r0 = info["round"]
        eng.run(resume=True)
        # the bloom still claims the victims seen; cross-round
        # link-rediscovered victims surface as recovered false
        # positives in the metrics
        fp = sum(
            json.load(open(eng._path(r, "metrics.json")))[
                "bloom_false_positives"
            ]
            for r in range(r0 + 1, eng.last_round()[0] + 1)
        )
        assert fp > 0
        assert set(victims) <= eng.seen_set()
        resched = [
            u for r, _k, u in eng.crawl_order()
            if r > r0 and u in set(victims)
        ]
        assert set(resched) == set(victims)
        assert max(Counter(resched).values()) == 1, "victim crawled twice"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.spark
def test_bloom_authoritative_cannot_expire(spark, web):
    cfg = CrawlConfig(exact_backstop=False)
    tmp = tempfile.mkdtemp(prefix="recrawl_no_")
    try:
        pages, robots, seeds = web
        eng = CrawlEngine(spark, pages, robots, tmp, cfg)
        with pytest.raises(ValueError, match="bloom cannot delete"):
            eng.expire(spark.createDataFrame([("x",)], "url string"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.spark
def test_event_log_semantics(spark, web):
    """add -> expire -> re-add -> expire again: membership follows the
    latest event; double expiry is idempotent."""
    cfg = CrawlConfig(batch_size=16, max_rounds=14, n_shards=8,
                      seen_filter="cuckoo", cuckoo_buckets=1 << 10)
    tmp = tempfile.mkdtemp(prefix="recrawl_ev_")
    try:
        eng = _run_to_done(spark, web, cfg, tmp)
        victims, _ = _expire_and_resume(spark, eng)  # re-added by resume
        assert set(victims) <= eng.seen_set()
        # expire the same urls again (second expiry round > re-add round)
        eng.expire(
            spark.createDataFrame([(u,) for u in victims], "url string"),
            reenqueue=False,
        )
        assert not (set(victims) & eng.seen_set())
        # idempotent double-expire in the same round
        eng.expire(
            spark.createDataFrame([(u,) for u in victims], "url string"),
            reenqueue=False,
        )
        assert not (set(victims) & eng.seen_set())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.spark
def test_rediscovered_victim_keeps_seed_priority(spark):
    """A re-enqueued victim that is link-rediscovered BEFORE being
    scheduled keeps its depth-0 seed priority (the engine best-
    priority-merges; the oracle must not overwrite with the decayed
    discovery) -- engine order == simulate(expire_events) on a chain
    where the recrawled parent re-links a pending victim."""
    from rsoup_spark.crawl.oracle import simulate

    H = "https://h0.test"

    def page(url, links):
        body = "".join(f'<a href="{x}">x</a>' for x in links)
        return (url, f"<html><body>{body}</body></html>")

    graph = {
        f"{H}/a": [f"{H}/b", f"{H}/w"],
        f"{H}/b": [f"{H}/u"],
        f"{H}/u": [],
        f"{H}/w": [],
    }
    pages = spark.createDataFrame(
        [page(u, ls) for u, ls in graph.items()],
        "url string, html string",
    )
    robots = spark.createDataFrame(
        [("h0.test", ["/private"], 1.0)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    seeds = spark.createDataFrame(
        [(f"{H}/a", 1.0, 0)], "url string, score double, depth int"
    )
    cfg = CrawlConfig(batch_size=16, round_seconds=1.0, max_rounds=10,
                      n_shards=4, seen_filter="cuckoo",
                      cuckoo_buckets=1 << 10, checkpoint_coalesce=1)
    tmp = tempfile.mkdtemp(prefix="recrawl_pri_")
    try:
        eng = CrawlEngine(spark, pages, robots, tmp, cfg)
        eng.run(seeds=seeds)
        victims = [f"{H}/b", f"{H}/u", f"{H}/w"]
        eng.expire(
            spark.createDataFrame([(u,) for u in victims], "url string")
        )
        eng.run(resume=True)
        want_order, want_seen = simulate(
            graph, [(f"{H}/a", 1.0, 0)],
            [("h0.test", ["/private"], 1.0)],
            batch_size=16, round_seconds=1.0, max_rounds=10,
            expire_events=[victims],
        )
        assert eng.crawl_order() == want_order
        assert eng.seen_set() == want_seen
        # the recrawl-path manifest row counts reflect the tables
        # actually written (the derived arithmetic is stale once the
        # merge collapses duplicates)
        last, _ = eng.last_round()
        assert (
            eng.store.read_manifest()["snapshot"]["tables"]["frontier"][
                "rows"
            ]
            == eng.store.read(last, "frontier").count()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.spark
def test_two_expiries_at_cap_match_oracle_and_stay_bounded(spark):
    """Two expire() -> run(resume=True) cycles, each at the round cap,
    on a crawl that never drains: the horizon extends exactly one
    max_rounds window per expiry (engine order/seen == oracle with the
    same expire_events), and FURTHER plain resumes run nothing -- the
    expired log from earlier windows must not keep extending the cap
    (the unbounded-crawl regression)."""
    from rsoup_spark.crawl.oracle import simulate

    H = "https://h0.test"

    def page(url, links):
        body = "".join(f'<a href="{x}">x</a>' for x in links)
        return (url, f"<html><body>{body}</body></html>")

    graph = {
        f"{H}/a": [f"{H}/b", f"{H}/c", f"{H}/d", f"{H}/e"],
        f"{H}/b": [], f"{H}/c": [], f"{H}/d": [], f"{H}/e": [],
    }
    pages = spark.createDataFrame(
        [page(u, ls) for u, ls in graph.items()],
        "url string, html string",
    )
    robots = spark.createDataFrame(
        [("h0.test", ["/private"], 1.0)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    seeds = spark.createDataFrame(
        [(f"{H}/a", 1.0, 0)], "url string, score double, depth int"
    )
    cfg = CrawlConfig(batch_size=1, round_seconds=1.0, max_rounds=2,
                      n_shards=4, checkpoint_coalesce=1)
    tmp = tempfile.mkdtemp(prefix="recrawl_2x_")
    try:
        eng = CrawlEngine(spark, pages, robots, tmp, cfg)
        h = eng.run(seeds=seeds)
        assert len(h) == 2 and h[-1]["n_scheduled"] > 0  # capped mid-work
        ev1, ev2 = [f"{H}/a"], [f"{H}/b"]
        eng.expire(spark.createDataFrame([(u,) for u in ev1], "url string"))
        assert len(eng.run(resume=True)) == 2  # one window, not more
        eng.expire(spark.createDataFrame([(u,) for u in ev2], "url string"))
        assert len(eng.run(resume=True)) == 2
        want_order, want_seen = simulate(
            graph, [(f"{H}/a", 1.0, 0)],
            [("h0.test", ["/private"], 1.0)],
            batch_size=1, round_seconds=1.0, max_rounds=2,
            expire_events=[ev1, ev2],
        )
        assert eng.crawl_order() == want_order
        assert eng.seen_set() == want_seen
        # stale expired log must not re-extend: repeated plain resumes
        # at the new cap run zero rounds
        assert eng.run(resume=True) == []
        assert eng.run(resume=True) == []
        assert eng.last_round()[0] == 6
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.spark
def test_cuckoo_backstop_off_no_double_crawl(spark):
    """Production cuckoo mode (exact_backstop=False, the filter IS the
    seen set): a rescheduled victim's fingerprint is re-inserted in its
    scheduling round, so a LATER round's link to it cannot re-admit it
    via probably_new -- order/seen match the oracle, no URL crawled
    twice after the recrawl."""
    from collections import Counter

    from rsoup_spark.crawl.oracle import simulate

    H = "https://h0.test"

    def page(url, links):
        body = "".join(f'<a href="{x}">x</a>' for x in links)
        return (url, f"<html><body>{body}</body></html>")

    graph = {
        f"{H}/a": [f"{H}/b", f"{H}/c"],
        f"{H}/b": [],
        f"{H}/c": [f"{H}/b"],
    }
    pages = spark.createDataFrame(
        [page(u, ls) for u, ls in graph.items()],
        "url string, html string",
    )
    robots = spark.createDataFrame(
        [("h0.test", ["/private"], 1.0)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    seeds = spark.createDataFrame(
        [(f"{H}/a", 1.0, 0)], "url string, score double, depth int"
    )
    cfg = CrawlConfig(batch_size=1, round_seconds=1.0, max_rounds=10,
                      n_shards=4, seen_filter="cuckoo",
                      cuckoo_buckets=1 << 10, exact_backstop=False,
                      checkpoint_coalesce=1)
    tmp = tempfile.mkdtemp(prefix="recrawl_ckoff_")
    try:
        eng = CrawlEngine(spark, pages, robots, tmp, cfg)
        eng.run(seeds=seeds)
        victims = [f"{H}/b", f"{H}/c"]
        eng.expire(
            spark.createDataFrame([(u,) for u in victims], "url string")
        )
        eng.run(resume=True)
        want_order, want_seen = simulate(
            graph, [(f"{H}/a", 1.0, 0)],
            [("h0.test", ["/private"], 1.0)],
            batch_size=1, round_seconds=1.0, max_rounds=10,
            expire_events=[victims],
        )
        assert eng.crawl_order() == want_order
        assert eng.seen_set() == want_seen
        post = [u for r, _k, u in eng.crawl_order() if r > 4]
        assert max(Counter(post).values()) == 1, "victim crawled twice"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.spark
def test_capped_resume_stays_capped_without_expiry(spark, web):
    """A crawl that hits max_rounds with work remaining keeps its cap
    on plain resume (no silent unbounded crawl); only a post-expiry
    resume extends the horizon."""
    cfg = CrawlConfig(batch_size=4, round_seconds=1.0, max_rounds=2,
                      n_shards=8, seen_filter="cuckoo",
                      cuckoo_buckets=1 << 10)
    tmp = tempfile.mkdtemp(prefix="recrawl_cap_")
    try:
        pages, robots, seeds = web
        eng = CrawlEngine(spark, pages, robots, tmp, cfg)
        h = eng.run(seeds=seeds)
        assert len(h) == 2 and h[-1]["n_scheduled"] > 0  # capped mid-work
        assert eng.run(resume=True) == []  # cap respected
        assert eng.last_round()[0] == 2
        # post-expiry resume DOES get a fresh window and recrawls
        victims = sorted(u for _r, _k, u in eng.crawl_order())[:2]
        eng.expire(
            spark.createDataFrame([(u,) for u in victims], "url string")
        )
        h2 = eng.run(resume=True)
        assert h2, "post-expiry resume must run rounds past the cap"
        resched = {
            u for r, _k, u in eng.crawl_order()
            if r > 2 and u in set(victims)
        }
        assert resched == set(victims)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
