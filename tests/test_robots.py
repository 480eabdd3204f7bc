"""robots.txt parser + allow-rule (longest-match) crawl semantics."""

import shutil
import tempfile

import pytest

from rsoup_spark.crawl.robots import parse_robots_body


class TestParseRobotsBody:
    def test_star_group_and_delay(self):
        a, d, delay, bad = parse_robots_body(
            "User-agent: *\nDisallow: /private\nCrawl-delay: 2.5",
            "rsoup-spark",
        )
        assert (a, d, delay, bad) == ([], ["/private"], 2.5, 0)

    def test_specific_agent_beats_star(self):
        body = (
            "User-agent: *\nDisallow: /all\n\n"
            "User-agent: rsoup\nDisallow: /mine\nCrawl-delay: 9"
        )
        a, d, delay, _ = parse_robots_body(body, "rsoup-spark")
        assert d == ["/mine"] and delay == 9.0
        # an agent the named group doesn't prefix-match falls to *
        a, d, delay, _ = parse_robots_body(body, "otherbot")
        assert d == ["/all"] and delay == 1.0

    def test_adjacent_user_agent_lines_share_group(self):
        body = (
            "User-agent: alpha\nUser-agent: rsoup\nDisallow: /x\n\n"
            "User-agent: *\nDisallow: /y"
        )
        _, d, _, _ = parse_robots_body(body, "rsoup-spark")
        assert d == ["/x"]

    def test_longest_named_match_wins(self):
        body = (
            "User-agent: rsoup\nDisallow: /short\n\n"
            "User-agent: rsoup-spark\nDisallow: /long"
        )
        _, d, _, _ = parse_robots_body(body, "rsoup-spark")
        assert d == ["/long"]

    def test_wildcards_dropped_and_counted(self):
        body = (
            "User-agent: *\nDisallow: /a*b\nDisallow: /c$\n"
            "Allow: /ok\nDisallow: /plain"
        )
        a, d, _, bad = parse_robots_body(body, "x")
        assert a == ["/ok"] and d == ["/plain"] and bad == 2

    def test_empty_disallow_is_allow_all(self):
        a, d, _, _ = parse_robots_body(
            "User-agent: *\nDisallow:", "x"
        )
        assert a == [] and d == []

    def test_rules_before_any_group_ignored_and_comments(self):
        a, d, delay, _ = parse_robots_body(
            "Disallow: /early\n# note\nUser-agent: *  # trailing\n"
            "Disallow: /kept  # comment",
            "x",
        )
        assert d == ["/kept"]

    def test_no_matching_group(self):
        a, d, delay, _ = parse_robots_body(
            "User-agent: somebody\nDisallow: /x", "rsoup-spark",
            default_delay=3.0,
        )
        assert (a, d, delay) == ([], [], 3.0)


@pytest.mark.spark
def test_parse_robots_txt_dataframe(spark):
    from rsoup_spark.crawl.fixtures import gen_robots_txt, robots_rows_txt
    from rsoup_spark.crawl.robots import parse_robots_txt

    parsed = parse_robots_txt(gen_robots_txt(spark, n_hosts=6))
    got = {
        r["host"]: (
            list(r["allow_prefixes"]),
            list(r["disallow_prefixes"]),
            r["crawl_delay"],
            r["n_unsupported"],
        )
        for r in parsed.collect()
    }
    want = {
        host: (allow, disallow, delay, 0)
        for host, disallow, delay, allow in robots_rows_txt(6)
    }
    assert got == want


@pytest.mark.spark
def test_crawl_with_raw_robots_allow_carveout(spark):
    """End-to-end: raw robots.txt -> parse -> crawl.  The Allow
    carve-out must change behavior (/page/12 crawled on the restricted
    host, /page/1x siblings still blocked) and the run must equal the
    allow-aware oracle simulator."""
    from rsoup_spark.crawl.fixtures import (
        gen_pages,
        gen_robots_txt,
        gen_seeds,
        robots_rows_txt,
    )
    from rsoup_spark.crawl.frontier import CrawlConfig, CrawlEngine
    from rsoup_spark.crawl.oracle import simulate
    from rsoup_spark.crawl.robots import parse_robots_txt

    pages = gen_pages(
        spark, n_hosts=6, base_pages=14, hot_factor=4, links_per_page=5,
        seed=7,
    ).persist()
    pages.count()
    seeds = gen_seeds(spark, n_hosts=6)
    robots = parse_robots_txt(gen_robots_txt(spark, n_hosts=6))

    cfg = CrawlConfig(batch_size=32, round_seconds=10.0, max_rounds=10,
                      n_shards=8, m_bits=1 << 16)
    tmp = tempfile.mkdtemp(prefix="crawl_rb_")
    try:
        eng = CrawlEngine(spark, pages, robots, tmp, cfg)
        eng.run(seeds=seeds)
        got_order = eng.crawl_order()

        graph = {
            r["url"]: list(r["out_links"])
            for r in pages.select("url", "out_links").collect()
        }
        want_order, want_seen = simulate(
            graph,
            [(r["url"], r["score"], r["depth"]) for r in seeds.collect()],
            robots_rows_txt(6),
            batch_size=cfg.batch_size,
            round_seconds=cfg.round_seconds,
            max_rounds=cfg.max_rounds,
        )
        assert got_order == want_order
        assert eng.seen_set() == want_seen

        # the carve-out actually fired: site1 /page/12 crawled, but no
        # other /page/1x on that host
        crawled = [u for _r, _k, u in got_order
                   if u.startswith("https://site1.test/")]
        assert any("/page/12" in u for u in crawled), crawled
        for u in crawled:
            tail = u.split("site1.test")[1]
            assert not tail.startswith("/page/1") or tail.startswith(
                "/page/12"
            ), u
    finally:
        pages.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
