"""robots.txt parsing -> the frontier's structured robots table.

North-rule surface: "robots.txt allow/deny" scheduling.  The reference
repo has no crawler (rsoup is extraction-only), so semantics follow the
Robots Exclusion Protocol (RFC 9309) restricted to the prefix subset
the frontier's JVM-side gate evaluates:

* records are grouped by ``User-agent`` lines; the most specific group
  wins (exact agent-token match beats ``*``; agent matching is
  case-insensitive on the product token).  Adjacent user-agent lines
  share one group (RFC 9309 §2.2.1).
* ``Allow`` / ``Disallow`` values are path prefixes.  Rules containing
  the RFC wildcards ``*``/``$`` are NOT expressible as prefixes; they
  are dropped and counted in ``n_unsupported`` rather than silently
  mis-applied (documented divergence -- the synthetic fixtures never
  emit them).
* empty ``Disallow:`` means allow-all (contributes no rule).
* ``Crawl-delay`` (non-RFC but ubiquitous) is taken from the winning
  group, defaulting to ``default_delay``.
* longest-match-wins between allow and disallow, allow winning ties
  (RFC 9309 §2.2.2 "least restrictive rule"), is applied by the
  frontier gate itself (frontier.py), not here.

Parsing is one vectorized mapInPandas pass (no per-row Python stage
chaining); the pure function ``parse_robots_body`` is the unit-tested
core.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ROBOTS_PARSED_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("allow_prefixes", ArrayType(StringType()), False),
        StructField("disallow_prefixes", ArrayType(StringType()), False),
        StructField("crawl_delay", DoubleType(), False),
        StructField("n_unsupported", IntegerType(), False),
    ]
)


def parse_robots_body(
    body: str, user_agent: str, default_delay: float = 1.0
) -> tuple[list[str], list[str], float, int]:
    """-> (allow_prefixes, disallow_prefixes, crawl_delay, n_unsupported).

    Picks the most specific matching group: a group whose user-agent
    token is a case-insensitive prefix-token match of ``user_agent``
    beats the ``*`` group; among named matches the longest token wins.
    """
    agent = user_agent.lower()
    # group -> (specificity, allows, disallows, delay); specificity is
    # the matched token length, 0 for '*', -1 for non-matching groups
    groups: list[tuple[int, list, list, list]] = []
    cur_tokens: list[str] = []
    cur_rules: tuple[list, list, list] | None = None
    n_unsupported = 0

    def open_group(tokens: list[str]):
        spec = -1
        for t in tokens:
            tl = t.lower()
            if tl == "*":
                spec = max(spec, 0)
            elif agent.startswith(tl):
                spec = max(spec, len(tl))
        rules: tuple[list, list, list] = ([], [], [])
        groups.append((spec, *rules))
        return rules

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur_rules is not None:
                # a rule line has been seen: this user-agent starts a
                # NEW group; otherwise it extends the current header
                cur_tokens, cur_rules = [], None
            cur_tokens.append(val)
            continue
        if cur_rules is None:
            if not cur_tokens:
                continue  # rules before any user-agent line: ignored
            cur_rules = open_group(cur_tokens)
        allows, disallows, delays = cur_rules
        if key in ("allow", "disallow"):
            if not val:
                continue  # empty Disallow = allow-all, no rule
            if "*" in val or "$" in val:
                n_unsupported += 1
                continue
            (allows if key == "allow" else disallows).append(val)
        elif key == "crawl-delay":
            try:
                delays.append(float(val))
            except ValueError:
                pass

    best = max(
        (g for g in groups if g[0] >= 0), key=lambda g: g[0], default=None
    )
    if best is None:
        return [], [], default_delay, n_unsupported
    _, allows, disallows, delays = best
    delay = delays[0] if delays else default_delay
    return allows, disallows, delay, n_unsupported


def parse_robots_txt(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "rsoup-spark",
    default_delay: float = 1.0,
) -> DataFrame:
    """(host, robots_txt) -> structured robots table for CrawlEngine.

    One Arrow-batched pass; output schema matches the engine's robots
    input plus ``allow_prefixes`` (longest-match allow carve-outs) and
    ``n_unsupported`` (wildcard rules dropped, for observability).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "host": [],
                "allow_prefixes": [],
                "disallow_prefixes": [],
                "crawl_delay": [],
                "n_unsupported": [],
            }
            for host, body in zip(pdf[host_col], pdf[body_col]):
                a, d, delay, bad = parse_robots_body(
                    body, user_agent, default_delay
                )
                out["host"].append(host)
                out["allow_prefixes"].append(a)
                out["disallow_prefixes"].append(d)
                out["crawl_delay"].append(delay)
                out["n_unsupported"].append(bad)
            yield pd.DataFrame(out)

    return df.select(host_col, body_col).mapInPandas(
        run, ROBOTS_PARSED_SCHEMA
    )


# -- sitemap discovery --------------------------------------------------------

SITEMAP_LINKS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("sitemap_url", StringType(), False),
    ]
)


def robots_sitemaps(body: str, base: str | None = None) -> list[str]:
    """``Sitemap:`` lines -> sitemap URLs, file order, deduped.

    Per sitemaps.org ("robots.txt discovery") and RFC 9309 §2.2.4
    these lines are group-independent -- they apply regardless of any
    ``User-agent`` group -- so this is a separate walk from
    ``parse_robots_body``.  Values must be absolute URLs per spec;
    relative ones (seen in the wild) resolve against ``base`` when
    given, else are dropped.
    """
    from ..functions.urlnorm import canonicalize_url

    out: list[str] = []
    seen: set[str] = set()
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        key, sep, val = line.partition(":")
        if not sep or key.strip().lower() != "sitemap":
            continue
        url = canonicalize_url(val.strip(), base)
        if url and url not in seen:
            seen.add(url)
            out.append(url)
    return out


def discover_sitemaps(
    df: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, sitemap_url) rows: the sitemap
    discovery half of the robots fetch, feeding ``sources/sitemap.py``
    (fetch the URLs, then ``sitemap_entries`` -> ``sitemap_seeds``).
    One Arrow-batched pass, same shape as ``parse_robots_txt``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"host": [], "sitemap_url": []}
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for u in robots_sitemaps(
                        body, base=f"http://{host}/robots.txt"):
                    out["host"].append(host)
                    out["sitemap_url"].append(u)
            yield pd.DataFrame(out)

    return df.select(host_col, body_col).mapInPandas(
        run, SITEMAP_LINKS_SCHEMA
    )
