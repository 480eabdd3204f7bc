"""Deterministic synthetic web: link graph + pages + robots + seeds.

Everything is a pure function of (host index, page index, seed) through
splitmix64 -- no RNG state, so generation is embarrassingly parallel
(mapInPandas over a range) and bit-identical at any parallelism
(FIXTURES.md F2-F4).

Host 0 is "hot" (hot_factor x pages) to exercise skew handling; hrefs
are emitted in rotating surface forms (absolute, uppercased host,
path-absolute, dot-relative, scheme-relative, fragment-suffixed) so the
canonicalizer does real work; robots disallow a prefix on every 5th
host and set per-host crawl delays for the politeness scheduler.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.urlnorm import splitmix64

PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("html", StringType(), False),
        StructField("out_links", ArrayType(StringType(), False), False),
    ]
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow_prefixes", ArrayType(StringType(), False), False),
        StructField("crawl_delay", DoubleType(), False),
    ]
)


def host_name(i: int) -> str:
    return f"site{i}.test"


def page_url(host_i: int, page_j: int) -> str:
    return f"https://{host_name(host_i)}/page/{page_j}"


def pages_per_host(host_i: int, base_pages: int, hot_factor: int) -> int:
    return base_pages * hot_factor if host_i == 0 else base_pages


def out_link_targets(
    host_i: int,
    page_j: int,
    n_hosts: int,
    base_pages: int,
    hot_factor: int,
    links_per_page: int,
    seed: int,
) -> list[tuple[int, int]]:
    """Deterministic link targets: ~70% same-host, 30% cross-host."""
    targets = []
    for li in range(links_per_page):
        r = splitmix64(seed ^ (host_i * 1_000_003 + page_j * 131 + li))
        if r % 10 < 7:
            th = host_i
        else:
            th = (r >> 8) % n_hosts
        tp = (r >> 24) % pages_per_host(th, base_pages, hot_factor)
        targets.append((int(th), int(tp)))
    return targets


_HREF_FORMS = 6


def href_form(host_i: int, page_j: int, th: int, tp: int, variant: int) -> str:
    """Rotating surface forms; all canonicalize to page_url(th, tp)."""
    target = page_url(th, tp)
    v = variant % _HREF_FORMS
    if v == 0:
        return target
    if v == 1:
        return f"https://{host_name(th).upper()}/page/{tp}"
    if v == 2 and th == host_i:
        return f"/page/{tp}"
    if v == 3 and th == host_i:
        return f"./{tp}"
    if v == 4:
        return f"//{host_name(th)}/page/{tp}"
    return f"{target}#sec{variant}"


def render_page(
    host_i: int,
    page_j: int,
    n_hosts: int,
    base_pages: int,
    hot_factor: int,
    links_per_page: int,
    seed: int,
) -> tuple[str, str, str, list[str]]:
    """-> (url, host, html, canonical out_links)."""
    url = page_url(host_i, page_j)
    targets = out_link_targets(
        host_i, page_j, n_hosts, base_pages, hot_factor, links_per_page, seed
    )
    anchors = []
    canon = []
    for li, (th, tp) in enumerate(targets):
        href = href_form(host_i, page_j, th, tp, li + page_j)
        anchors.append(f'<li><a href="{href}">link {li}</a></li>')
        canon.append(page_url(th, tp))
    wordseed = splitmix64(seed ^ (host_i * 7919 + page_j))
    words = " ".join(
        f"w{(wordseed >> (4 * k)) % 97}" for k in range(12)
    )
    html = (
        "<html><body>"
        f"<h1>Page {page_j} of {host_name(host_i)}</h1>"
        f"<p>{words}</p>"
        "<table><tbody>"
        f"<tr><th>host</th> <th>page</th></tr> "
        f"<tr><td>{host_name(host_i)}</td> <td>{page_j}</td></tr>"
        "</tbody></table>"
        f"<h2>Links</h2><ul>{''.join(anchors)}</ul>"
        "</body></html>"
    )
    # canonical out-links, deduped, first occurrence order (ground truth
    # for the oracle simulator)
    seen = set()
    uniq = [u for u in canon if not (u in seen or seen.add(u))]
    return url, host_name(host_i), html, uniq


def gen_pages(
    spark: SparkSession,
    n_hosts: int = 8,
    base_pages: int = 20,
    hot_factor: int = 10,
    links_per_page: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Distributed page-store generation (pure function of the id)."""
    counts = [pages_per_host(i, base_pages, hot_factor) for i in range(n_hosts)]
    offsets = [0]
    for c in counts:
        offsets.append(offsets[-1] + c)
    total = offsets[-1]

    bounds = offsets  # closure capture

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bisect

        for pdf in batches:
            rows = []
            for gid in pdf["id"]:
                hi = bisect.bisect_right(bounds, int(gid)) - 1
                pj = int(gid) - bounds[hi]
                rows.append(
                    render_page(
                        hi, pj, n_hosts, base_pages, hot_factor,
                        links_per_page, seed,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url", "host", "html", "out_links"]
            )

    return spark.range(total).repartition(
        max(spark.sparkContext.defaultParallelism, 8)
    ).mapInPandas(run, PAGE_SCHEMA)


def gen_robots(spark: SparkSession, n_hosts: int = 8) -> DataFrame:
    """Every 5th host disallows /page/1 (prefix: blocks 1, 10-19, ...);
    crawl_delay cycles 1..3 seconds."""
    rows = []
    for i in range(n_hosts):
        prefixes = ["/private"]
        if i % 5 == 1:
            prefixes.append("/page/1")
        rows.append((host_name(i), prefixes, float(1 + (i % 3))))
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def gen_robots_txt(spark: SparkSession, n_hosts: int = 8) -> DataFrame:
    """Raw robots.txt bodies (host, robots_txt) with the same semantics
    as gen_robots PLUS an Allow carve-out: hosts with i % 5 == 1
    disallow /page/1 but allow /page/12 back in (longest-match-wins
    makes /page/12* crawlable while /page/1, /page/10.. stay blocked).
    A decoy specific-agent group and comments exercise the parser."""
    rows = []
    for i in range(n_hosts):
        body = [
            "# synthetic robots fixture",
            "User-agent: EvilBot",
            "Disallow: /",  # must NOT apply to rsoup-spark
            "",
            "User-agent: *",
            "Disallow: /private",
        ]
        if i % 5 == 1:
            body.append("Disallow: /page/1")
            body.append("Allow: /page/12")
        body.append(f"Crawl-delay: {float(1 + (i % 3))}")
        rows.append((host_name(i), "\n".join(body)))
    return spark.createDataFrame(rows, "host STRING, robots_txt STRING")


def robots_rows_txt(n_hosts: int = 8) -> list[tuple]:
    """Oracle-simulator mirror of gen_robots_txt's parsed semantics:
    (host, disallow, delay, allow) rows."""
    rows = []
    for i in range(n_hosts):
        disallow = ["/private"]
        allow: list[str] = []
        if i % 5 == 1:
            disallow.append("/page/1")
            allow.append("/page/12")
        rows.append((host_name(i), disallow, float(1 + (i % 3)), allow))
    return rows


def gen_seeds(spark: SparkSession, n_hosts: int = 8) -> DataFrame:
    """One seed per even-indexed host, fixed order."""
    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("score", DoubleType(), False),
            StructField("depth", IntegerType(), False),
        ]
    )
    rows = [
        (page_url(i, 0), 1.0, 0) for i in range(n_hosts) if i % 2 == 0
    ]
    return spark.createDataFrame(rows, schema)


def robots_rows(n_hosts: int = 8) -> list[tuple[str, list[str], float]]:
    """Driver-side mirror for the oracle simulator."""
    rows = []
    for i in range(n_hosts):
        prefixes = ["/private"]
        if i % 5 == 1:
            prefixes.append("/page/1")
        rows.append((host_name(i), prefixes, float(1 + (i % 3))))
    return rows
