"""Sitemap ingest (sources/sitemap.py) + CDX index (sources/cdx.py):
writer/parser units, SURT key semantics, and the distributed surfaces."""

import pytest


class TestSitemapCodec:
    def test_urlset_roundtrip(self):
        from rsoup_spark.sources.sitemap import parse_sitemap, write_sitemap

        entries = [
            {"loc": "http://a.test/", "lastmod": "2026-01-02",
             "changefreq": "daily", "priority": 0.8},
            {"loc": "http://a.test/x?q=1&r=2"},
            {"loc": "http://a.test/amp&lt", "priority": 0.1},
        ]
        for gz in (False, True):
            out = parse_sitemap(write_sitemap(entries, gzipped=gz))
            assert [e["kind"] for e in out] == ["url"] * 3
            assert out[0]["loc"] == "http://a.test/"
            assert out[0]["lastmod"] == "2026-01-02"
            assert out[0]["changefreq"] == "daily"
            assert out[0]["priority"] == pytest.approx(0.8)
            assert out[1]["loc"] == "http://a.test/x?q=1&r=2"
            assert out[1]["priority"] is None
            assert out[2]["loc"] == "http://a.test/amp&lt"

    def test_sitemapindex(self):
        from rsoup_spark.sources.sitemap import parse_sitemap, write_sitemap

        out = parse_sitemap(write_sitemap(
            [{"loc": "http://a.test/s1.xml.gz", "lastmod": "2026-02-03"},
             {"loc": "http://a.test/s2.xml.gz"}],
            index=True,
        ))
        assert [e["kind"] for e in out] == ["sitemap", "sitemap"]
        assert out[0]["loc"] == "http://a.test/s1.xml.gz"
        assert out[0]["lastmod"] == "2026-02-03"

    def test_lenient_entries_strict_files(self):
        from rsoup_spark.sources.sitemap import parse_sitemap

        # junk changefreq/priority null out; entry without loc skipped;
        # namespace-free XML accepted
        xml = b"""<?xml version="1.0"?><urlset>
          <url><loc>http://a.test/1</loc>
               <changefreq>often</changefreq>
               <priority>7</priority></url>
          <url><lastmod>2026-01-01</lastmod></url>
          <url><loc>http://a.test/2</loc><priority>junk</priority></url>
        </urlset>"""
        out = parse_sitemap(xml)
        assert [e["loc"] for e in out] == \
            ["http://a.test/1", "http://a.test/2"]
        assert out[0]["changefreq"] is None
        assert out[0]["priority"] is None  # out of [0,1]
        assert out[1]["priority"] is None  # unparseable

        with pytest.raises(ValueError, match="xml"):
            parse_sitemap(b"<urlset><url>")
        with pytest.raises(ValueError, match="gzip"):
            parse_sitemap(b"\x1f\x8bnope")
        with pytest.raises(ValueError, match="root"):
            parse_sitemap(b"<rss></rss>")

    def test_deterministic_fixture_bytes(self):
        from rsoup_spark.sources.sitemap import write_sitemap

        e = [{"loc": "http://a.test/", "priority": 0.5}]
        assert write_sitemap(e, gzipped=True) == \
            write_sitemap(e, gzipped=True)


def _surt_py(url: str) -> str:
    """Reference SURT (pure Python) for fuzzing the JVM expression."""
    rest = url.split("://", 1)[1] if "://" in url else url
    cut = min((i for i in (rest.find("/"), rest.find("?"), rest.find("#"))
               if i >= 0), default=-1)
    hostport, pathq = (rest, "") if cut < 0 else \
        (rest[:cut], rest[cut:])
    if "#" in pathq:
        pathq = pathq[:pathq.find("#")]
    if "@" in hostport:
        hostport = hostport.rsplit("@", 1)[1]
    hostport = hostport.lower()
    host, _, port = hostport.partition(":")
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split(".")))
    if port:
        key += ":" + port
    path, sep, query = pathq.partition("?")
    if sep:
        query = "?" + "&".join(sorted(query.split("&")))
    return key + ")" + (path or "/") + query


class TestSurt:
    CASES = {
        "https://www.Sub.Example.COM:8080/A/b?b=2&a=1":
            "com,example,sub:8080)/A/b?a=1&b=2",
        "http://example.com/": "com,example)/",
        "http://example.com": "com,example)/",
        "http://www.example.com/x": "com,example)/x",
        "http://a.b.c.d.test/p/q?z=1": "test,d,c,b,a)/p/q?z=1",
        "http://h.test/CaseKept/Path": "test,h)/CaseKept/Path",
        # raw-URL edge cases: query with no path slash, userinfo,
        # fragment -- all must key by the real host/path
        "http://example.com?b=2&a=1": "com,example)/?a=1&b=2",
        "http://user:pw@example.com/x": "com,example)/x",
        "http://example.com/x#frag": "com,example)/x",
        "http://example.com#frag": "com,example)/",
    }

    def test_reference_cases_py(self):
        for url, want in self.CASES.items():
            assert _surt_py(url) == want

    @pytest.mark.spark
    def test_jvm_expr_matches_reference(self, spark):
        from rsoup_spark.sources.cdx import surt_key

        urls = list(self.CASES) + [
            f"http://www.site{i}.sub{i % 5}.test:81/p{i}/x?b={i}&a={i%3}"
            for i in range(50)
        ]
        df = spark.createDataFrame([(u,) for u in urls], ["url"])
        got = {r["url"]: r["s"]
               for r in df.select("url", surt_key("url").alias("s"))
               .collect()}
        for u in urls:
            assert got[u] == _surt_py(u), u


@pytest.mark.spark
class TestDistributedSurfaces:
    def test_sitemap_entries_and_seeds(self, spark):
        from pyspark.sql import functions as F

        from rsoup_spark.sources.sitemap import (
            sitemap_entries, sitemap_seeds, write_sitemap,
        )

        um = write_sitemap([
            {"loc": "HTTP://A.test/p1#frag", "priority": 0.3},
            {"loc": "http://a.test/p1", "priority": 0.9},
            {"loc": "http://a.test/p2", "changefreq": "weekly"},
        ], gzipped=True)
        idx = write_sitemap(
            [{"loc": "http://a.test/s1.xml.gz"}], index=True)
        rows = [("s.xml.gz", bytearray(um)),
                ("i.xml", bytearray(idx)),
                ("junk.xml", bytearray(b"<html>no</html>"))]
        files = spark.createDataFrame(rows, ["src", "data"])
        ents = sitemap_entries(files)
        got = {(r["src"], r["entry_idx"]): r for r in ents.collect()}
        assert len(got) == 4  # junk dropped, 3 urls + 1 index entry
        assert got[("i.xml", 0)]["kind"] == "sitemap"
        assert got[("s.xml.gz", 2)]["changefreq"] == "weekly"

        seeds = {r["url"]: r["priority"]
                 for r in sitemap_seeds(ents).collect()}
        # canonicalizer folds case + strips fragment -> p1 dedups to
        # one seed with the max priority; index entries excluded
        assert set(seeds) == {"http://a.test/p1", "http://a.test/p2"}
        assert seeds["http://a.test/p1"] == pytest.approx(0.9)
        assert seeds["http://a.test/p2"] is None

    def test_cdx_index_sorted_and_lookup(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from rsoup_spark.sources.cdx import cdx_index, cdx_lookup

        caps = spark.createDataFrame(
            [(f"http://www.h{i % 7}.test/p/{i}?b=2&a=1", 20260000 + i,
              200, "text/html", f"sha1:{i}", f"f{i % 3}.warc.gz",
              i * 100, 99)
             for i in range(200)],
            ["url", "ts", "status", "mime", "digest",
             "filename", "offset", "length"],
        )
        idx = cdx_index(caps, shards=4)
        path = str(tmp_path / "cdx")
        idx.write.parquet(path)
        back = spark.read.parquet(path)
        assert back.count() == 200

        # global range order: per-file (min, max) surt windows disjoint
        per_file = (
            back.groupBy(F.input_file_name().alias("f"))
            .agg(F.min("surt").alias("lo"), F.max("surt").alias("hi"))
            .collect()
        )
        spans = sorted([(r["lo"], r["hi"]) for r in per_file])
        for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
            assert hi_prev <= lo_next

        hits = cdx_lookup(back, "http://h3.test/p/").collect()
        assert len(hits) == sum(1 for i in range(200) if i % 7 == 3)
        assert all(h["surt"].startswith("test,h3)/p/") for h in hits)
        # the probe is sargable: it must reach the parquet scan
        plan = cdx_lookup(back, "http://h3.test/p/") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "surt" in plan


class TestRobotsSitemapDiscovery:
    def test_group_independent_and_deduped(self):
        from rsoup_spark.crawl.robots import robots_sitemaps

        body = (
            "User-agent: alpha\nDisallow: /x\n"
            "Sitemap: HTTP://A.test/s.xml.gz\n"
            "User-agent: *\nAllow: /\n"
            "sitemap: http://a.test/s.xml.gz\n"  # dup after canon
            "Sitemap: /local.xml\n"              # relative -> base
            "Sitemap:\n"                          # empty -> dropped
        )
        assert robots_sitemaps(body, base="http://h.test/robots.txt") == \
            ["http://a.test/s.xml.gz", "http://h.test/local.xml"]
        assert robots_sitemaps(body) == ["http://a.test/s.xml.gz"]

    @pytest.mark.spark
    def test_discovery_loop(self, spark):
        """robots -> sitemap URLs -> sitemap bytes -> frontier seeds:
        the full discovery chain end-to-end."""
        from rsoup_spark.crawl.robots import discover_sitemaps
        from rsoup_spark.sources.sitemap import (
            sitemap_entries, sitemap_seeds, write_sitemap,
        )

        robots = spark.createDataFrame(
            [("h0.test", "User-agent: *\nSitemap: http://h0.test/sm.xml"),
             ("h1.test", "Disallow: /private")],
            ["host", "robots_txt"],
        )
        links = {(r["host"], r["sitemap_url"])
                 for r in discover_sitemaps(robots).collect()}
        assert links == {("h0.test", "http://h0.test/sm.xml")}

        # "fetch" the discovered sitemap and fold it into seeds
        blob = write_sitemap(
            [{"loc": "http://h0.test/p1", "priority": 0.4},
             {"loc": "http://h0.test/p1#dup", "priority": 0.6}])
        files = spark.createDataFrame(
            [("http://h0.test/sm.xml", bytearray(blob))], ["src", "data"])
        seeds = sitemap_seeds(sitemap_entries(files)).collect()
        assert len(seeds) == 1
        assert seeds[0]["url"] == "http://h0.test/p1"
        assert seeds[0]["priority"] == pytest.approx(0.6)


@pytest.mark.spark
class TestCdxRevisits:
    def test_runs_and_pointers(self, spark):
        from rsoup_spark.sources.cdx import cdx_revisits

        # one surt: digests A A B A A -> revisits at ts 2 and 5,
        # orig_ts = run starts 1, 1, 3, 4, 4
        rows = [("k)/p", t, d) for t, d in
                [(1, "A"), (2, "A"), (3, "B"), (4, "A"), (5, "A")]]
        rows += [("k)/q", 1, "A")]  # singleton: never a revisit
        idx = spark.createDataFrame(rows, ["surt", "ts", "digest"])
        got = {(r["surt"], r["ts"]): (r["is_revisit"], r["orig_ts"])
               for r in cdx_revisits(idx).collect()}
        assert got[("k)/p", 1)] == (False, 1)
        assert got[("k)/p", 2)] == (True, 1)
        assert got[("k)/p", 3)] == (False, 3)
        assert got[("k)/p", 4)] == (False, 4)
        assert got[("k)/p", 5)] == (True, 4)
        assert got[("k)/q", 1)] == (False, 1)

    def test_null_digest_never_revisits(self, spark):
        from rsoup_spark.sources.cdx import cdx_revisits

        rows = [("k)/p", 1, "A"), ("k)/p", 2, None), ("k)/p", 3, None)]
        idx = spark.createDataFrame(rows, ["surt", "ts", "digest"])
        got = {r["ts"]: (r["is_revisit"], r["orig_ts"])
               for r in cdx_revisits(idx).collect()}
        # null digests start fresh runs and never flag (and the flag
        # is a real False, not a null leaked by `null == x`)
        assert got[2] == (False, 2) and got[3] == (False, 3)


@pytest.mark.spark
def test_recrawl_candidates_max_capture_and_boundary(spark):
    """The latest capture (not any capture) decides staleness, and an
    equal lastmod/capture timestamp is NOT stale (strict >)."""
    from rsoup_spark.sources.cdx import recrawl_candidates

    entries = spark.createDataFrame(
        [("u1", "2026-01-10"), ("u2", "2026-01-10"), ("u3", "2026-01-10")],
        "url STRING, lastmod STRING",
    ).selectExpr("url", "CAST(lastmod AS TIMESTAMP) AS lastmod")
    caps = spark.createDataFrame(
        [
            ("u1", "2026-01-02"), ("u1", "2026-01-12"),  # latest wins
            ("u2", "2026-01-10"),                        # equal: fresh
        ],
        "url STRING, ts STRING",
    ).selectExpr("url", "CAST(ts AS TIMESTAMP) AS ts")
    got = {r["url"]: r.asDict()
           for r in recrawl_candidates(entries, caps).collect()}
    assert "u1" not in got            # latest capture is after lastmod
    assert "u2" not in got            # equal timestamp is not stale
    assert got["u3"]["reason"] == "never"
    assert got["u3"]["days_stale"] is None
