"""Template-budget trap rationing in the frontier: engine == oracle
under per-(host, template) lifetime schedule caps, resume mid-crawl,
and the Python/JVM template-masking mirror.
"""

import shutil
import tempfile

import pytest

from rsoup_spark.crawl.fixtures import gen_pages, gen_robots, gen_seeds, \
    robots_rows
from rsoup_spark.crawl.frontier import CrawlConfig, CrawlEngine
from rsoup_spark.crawl.oracle import simulate
from rsoup_spark.crawl.traps import template_of


@pytest.fixture(scope="module")
def web(spark):
    pages = gen_pages(
        spark, n_hosts=6, base_pages=8, hot_factor=10, links_per_page=5,
        seed=42,
    ).persist()
    pages.count()
    robots = gen_robots(spark, n_hosts=6)
    seeds = gen_seeds(spark, n_hosts=6)
    return pages, robots, seeds


def graph_of(pages):
    return {
        r["url"]: list(r["out_links"])
        for r in pages.select("url", "out_links").collect()
    }


def test_template_of_mirrors_jvm(spark):
    """The pure-Python mirror must equal the JVM expressions on every
    shape the masking handles (oracle equality rides on this)."""
    from pyspark.sql import functions as F

    from rsoup_spark.crawl.traps import url_template

    urls = [
        "https://a.test/page/7",
        "https://a.test/sess/deadbeefcafe/x?b=2&a=1",
        "https://a.test/",
        "https://a.test/a/b/b/item9",
        "https://a.test/x?flag&z=1",
        "https://a.test/CAFEBABE12345/y",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    h, t, _ = url_template(F.col("url"))
    got = {
        r["url"]: (r["h"], r["t"])
        for r in df.select("url", h.alias("h"), t.alias("t")).collect()
    }
    for u in urls:
        assert got[u] == template_of(u), u


@pytest.mark.spark
def test_budgeted_crawl_matches_oracle(spark, web):
    pages, robots, seeds = web
    cfg = CrawlConfig(batch_size=24, round_seconds=10.0, max_rounds=12,
                      n_shards=16, m_bits=1 << 18, template_budget=3)
    tmp = tempfile.mkdtemp(prefix="crawl_tpl_")
    try:
        eng = CrawlEngine(spark, pages, robots, tmp, cfg)
        history = eng.run(seeds=seeds)
        got_order = eng.crawl_order()
        got_seen = eng.seen_set()

        want_order, want_seen = simulate(
            graph_of(pages),
            [(r["url"], r["score"], r["depth"]) for r in seeds.collect()],
            robots_rows(6),
            batch_size=cfg.batch_size,
            round_seconds=cfg.round_seconds,
            max_rounds=cfg.max_rounds,
            template_budget=3,
        )
        assert got_order == want_order
        assert got_seen == want_seen
        # the budget must actually bind: the fixture has ONE template
        # per host (/page/N), so no host may ever schedule > 3 urls
        per_tpl: dict = {}
        for _r, _rank, u in got_order:
            k = template_of(u)
            per_tpl[k] = per_tpl.get(k, 0) + 1
        assert per_tpl and max(per_tpl.values()) <= 3
        assert any(m["n_template_blocked"] for m in history), (
            "expected exhausted templates to be dropped and counted"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.spark
def test_budgeted_resume_equals_uninterrupted(spark, web):
    """Kill after round 2 in budget mode, resume: the tpl_counts log
    must restore exact budget usage, keeping the resumed crawl
    round-for-round equal to an uninterrupted one."""
    pages, robots, seeds = web
    cfg = CrawlConfig(batch_size=16, max_rounds=6, n_shards=8,
                      m_bits=1 << 16, template_budget=2)
    t_full = tempfile.mkdtemp(prefix="crawl_tplf_")
    t_part = tempfile.mkdtemp(prefix="crawl_tplp_")
    try:
        full = CrawlEngine(spark, pages, robots, t_full, cfg)
        full.run(seeds=seeds)

        part = CrawlEngine(spark, pages, robots, t_part, cfg)
        part.init_state(seeds)
        part.run_round(1)
        part.run_round(2)
        # "crash" here; a fresh engine resumes from the manifest
        resumed = CrawlEngine(spark, pages, robots, t_part, cfg)
        resumed.run(resume=True)

        assert resumed.crawl_order() == full.crawl_order()
        assert resumed.seen_set() == full.seen_set()
    finally:
        shutil.rmtree(t_full, ignore_errors=True)
        shutil.rmtree(t_part, ignore_errors=True)
