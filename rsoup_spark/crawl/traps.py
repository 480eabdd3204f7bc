"""Crawler-trap detection and per-template admission control.

A frontier at 10^10-URL scale dies on traps: calendar pages that mint
a new URL per day forever, session ids that make every visit a "new"
page, and path loops (``/a/b/b/...``) that grow without bound.  The
standard defenses (Heritrix's pathological-path rules and queue
budgets, IRLbot's budget enforcement) are all *per-URL-template*: URLs
are collapsed to a template by masking the volatile parts, and each
(host, template) gets a crawl budget plus structural trap tells.

``url_templates`` computes that table:

* template = path with long-hex runs -> ``H`` and digit runs -> ``N``,
  plus the *sorted query-parameter names* (values dropped) -- so
  ``/events?date=2024-06-01&page=2`` and ``/events?page=9&date=...``
  share one template while ``/articles/123`` and ``/articles/9`` do.
* loop tell = any adjacent repeated path segment (the cheapest robust
  path-loop signature that needs no backreference, so the same regex-
  free array scan replays in RE2-only engines).
* depth tell = more than ``max_depth`` path segments.

Everything is integer/string-exact, map-only up to ONE groupBy on
(host, template) with map-side combine -- the output is templates, not
URLs, so the shuffle is template-sized.  Admission at crawl time is a
broadcast join of candidates against the (tiny) over-budget template
list; the operator itself never touches the frontier so crawl-order
oracle equality is unaffected.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRAP_BUDGET = 50  # max admissible URLs crawled per (host, template)
TRAP_MAX_DEPTH = 12  # path segments beyond this are a trap tell

_TPL_HEX = re.compile(r"[0-9a-fA-F]{8,}")
_TPL_NUM = re.compile(r"[0-9]+")
_TPL_URL = re.compile(r"^https?://([^/#?]+)([^?#]*)")
_TPL_QUERY = re.compile(r"\?([^#]*)")


def template_of(url: str) -> tuple[str, str]:
    """Pure-Python mirror of ``url_template`` (same regexes, same
    masking order, same sorted-query-name collapse) for the oracle
    simulator and driver-side tests.  Any drift between this and the
    JVM expressions breaks crawl-order oracle equality in
    template-budget mode, which is exactly what the equality tests are
    for."""
    m = _TPL_URL.match(url)
    host = m.group(1) if m else ""
    path = m.group(2) if m else ""
    qm = _TPL_QUERY.search(url)
    query = qm.group(1) if qm else ""
    tpl = _TPL_NUM.sub("N", _TPL_HEX.sub("H", path))
    qnames = sorted(p.split("=")[0] for p in query.split("&") if p)
    return host, (tpl + "?" + "&".join(qnames)) if qnames else tpl


def _segments(path: Column) -> Column:
    return F.filter(F.split(path, "/"), lambda s: s != "")


def _has_adjacent_dup(segs: Column) -> Column:
    """True iff some path segment equals its successor (path-loop
    tell).  Array-scan, no backreference: RE2-compatible by
    construction because there is no regex at all."""
    n = F.size(segs)
    k = F.greatest(n - 1, F.lit(0))
    return F.exists(
        F.zip_with(
            F.slice(segs, 1, k), F.slice(segs, 2, k), lambda a, b: a == b
        ),
        lambda x: x,
    )


def url_template(url: Column) -> tuple[Column, Column, Column]:
    """(host, template, segments) for one URL column.  Hex runs of 8+
    chars mask first (session ids), then any digit run -- both with
    patterns that mean the same thing in Java regex and RE2."""
    host = F.regexp_extract(url, r"^https?://([^/#?]+)", 1)
    path = F.regexp_extract(url, r"^https?://[^/#?]+([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    tpl_path = F.regexp_replace(
        F.regexp_replace(path, "[0-9a-fA-F]{8,}", "H"), "[0-9]+", "N"
    )
    qnames = F.array_sort(
        F.transform(
            F.filter(F.split(query, "&"), lambda p: p != ""),
            lambda p: F.split(p, "=").getItem(0),
        )
    )
    template = F.when(
        F.size(qnames) > 0,
        F.concat(tpl_path, F.lit("?"), F.array_join(qnames, "&")),
    ).otherwise(tpl_path)
    return host, template, _segments(path)


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    budget: int = TRAP_BUDGET,
    max_depth: int = TRAP_MAX_DEPTH,
) -> DataFrame:
    """Per-(host, template) admission table over a URL corpus:

      n_urls        distinct URLs collapsing to the template
      n_loop        distinct URLs with an adjacent repeated segment
      n_deep        distinct URLs deeper than ``max_depth`` segments
      n_admissible  distinct URLs with neither trap tell
      n_kept        least(n_admissible, budget)
      over_budget   n_admissible > budget (template needs rationing)

    One map-only projection then two keyed aggregations: dedupe on
    (host, template, url) first (map-side partial collapses repeat
    discoveries before the exchange), then plain conditional counts on
    (host, template).  Deduping first instead of countDistinct keeps
    the multi-distinct Expand (a 4x map-side row blowup) out of the
    plan, and the second exchange carries templates (bounded by site
    structure), never pages.  Hot hosts hash across partitions by
    template, which is exactly the skew split a per-host key would not
    give.
    """
    url = F.col(url_col)
    host, template, segs = url_template(url)
    per_url = df.select(
        url.alias("url"),
        host.alias("host"),
        template.alias("template"),
        _has_adjacent_dup(segs).alias("is_loop"),
        (F.size(segs) > max_depth).alias("is_deep"),
    )
    # is_loop / is_deep are pure functions of the url, so any
    # representative row carries them through the dedupe
    distinct = per_url.groupBy("host", "template", "url").agg(
        F.first("is_loop").alias("is_loop"),
        F.first("is_deep").alias("is_deep"),
    )
    adm = ~F.col("is_loop") & ~F.col("is_deep")
    one = F.lit(1).cast("long")
    return (
        distinct.groupBy("host", "template")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.sum(F.when(F.col("is_loop"), one).otherwise(0))
            .cast("long")
            .alias("n_loop"),
            F.sum(F.when(F.col("is_deep"), one).otherwise(0))
            .cast("long")
            .alias("n_deep"),
            F.sum(F.when(adm, one).otherwise(0))
            .cast("long")
            .alias("n_admissible"),
        )
        .select(
            "host",
            "template",
            "n_urls",
            "n_loop",
            "n_deep",
            "n_admissible",
            F.least(F.col("n_admissible"), F.lit(int(budget)))
            .cast("long")
            .alias("n_kept"),
            (F.col("n_admissible") > int(budget)).alias("over_budget"),
        )
    )


# Demonstration subsets of the standard URL-filter inputs (RefinedWeb,
# Penedo et al. 2023, appendix G.1 describes the scheme: a domain
# blocklist plus a weighted flagged-word score over the URL string).
# Production swaps in the full public lists (e.g. UT1) -- the operator
# takes them as arguments; nothing here is a shipped blocklist.
URL_BLOCKLIST = ("badsite.example", "spam.example")
# (word, weight) in quarter units: strict words 4 (presence alone
# rejects at the default threshold with one more soft hit), soft words
# 1 -- integer weights so the score replays exactly in SQL
URL_FLAG_WORDS = (
    ("casino", 4), ("poker", 4), ("warez", 4),
    ("pills", 1), ("betting", 1), ("download", 1),
)
URL_SCORE_THRESHOLD = 5  # reject at >= 5 quarters


def url_filter(
    df: DataFrame,
    url_col: str = "url",
    blocklist: tuple = URL_BLOCKLIST,
    flag_words: tuple = URL_FLAG_WORDS,
    threshold: int = URL_SCORE_THRESHOLD,
) -> DataFrame:
    """URL-level corpus filtering -- the FIRST gate of a web pipeline
    (cheaper than fetching, parsing, or scoring content): domain
    blocklist (exact host or any subdomain of a listed domain) plus an
    integer flagged-word score over the lowercased URL string
    (presence per word, weighted; reject at >= ``threshold``).

    Map-only JVM expressions: the lists arrive as literal predicates
    (bounded -- production lists are ~4M domains, at which point the
    blocklist becomes a broadcast join on host instead; the word score
    stays literal either way).  Returns every row with
    (host, blocked_domain, url_score, keep).
    """
    url = F.col(url_col)
    host = F.regexp_extract(url, r"^https?://([^/#?]+)", 1)
    low = F.lower(url)
    blocked = F.lit(False)
    for d in blocklist:
        blocked = blocked | (host == d) | host.endswith("." + d)
    score = F.lit(0)
    for w, wt in flag_words:
        score = score + F.when(low.contains(w), F.lit(int(wt))).otherwise(
            F.lit(0)
        )
    score = score.cast("long")
    return df.select(
        url.alias("url"),
        host.alias("host"),
        blocked.alias("blocked_domain"),
        score.alias("url_score"),
        (~blocked & (score < threshold)).alias("keep"),
    )


# a deterministic embedded subset of the Mozilla Public Suffix List
# (publicsuffix.org) -- the operator takes any list; production swaps
# the full ~9k-rule PSL in as a broadcast (suffix -> labels) join the
# same way url_filter's blocklist scales past literal predicates.
PUBLIC_SUFFIXES = (
    # 1-label
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "dev",
    "app", "uk", "de", "fr", "jp", "au", "br", "cn", "in", "us",
    # 2-label
    "co.uk", "ac.uk", "org.uk", "gov.uk", "com.au", "net.au",
    "org.au", "co.jp", "ne.jp", "or.jp", "com.br", "com.cn",
    "co.in", "github.io", "blogspot.com",
    # 3-label
    "s3.amazonaws.com",
)


def registrable_domain(
    host: Column,
    suffixes: tuple = PUBLIC_SUFFIXES,
) -> Column:
    """(suffix, registrable) struct for a host column under public-
    suffix rules: the LONGEST (most labels) listed suffix matching the
    host's tail wins; an unlisted TLD falls back to the PSL's default
    ``*`` rule (last label is the suffix); registrable = suffix plus
    one preceding label, NULL when the host IS a suffix (nothing to
    register).  Pure JVM split/slice/isin expressions, map-only --
    per-domain politeness budgets, trap budgets, and rollups all key
    on this instead of raw host so ``a.example.com`` and
    ``b.example.com`` share one budget while ``a.co.uk`` and
    ``b.co.uk`` do not.
    """
    by_len: dict[int, list[str]] = {}
    for s in suffixes:
        by_len.setdefault(s.count(".") + 1, []).append(s)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # build the CASE innermost-first (ascending label count) so the
    # outermost branch -- the longest listed suffix -- wins the match
    suffix = None
    for k in sorted(by_len):
        cand = F.concat_ws(".", F.slice(labels, -k, k))
        hit = (n >= k) & cand.isin(by_len[k])
        suffix = F.when(hit, cand) if suffix is None else F.when(
            hit, cand
        ).otherwise(suffix)
    # PSL default rule: unknown TLD -> the last label is the suffix
    suffix = F.coalesce(suffix, F.element_at(labels, -1))
    slabels = F.size(F.split(suffix, r"\."))
    reg = F.when(
        n > slabels,
        F.concat_ws(
            ".",
            F.element_at(labels, (-slabels - 1).cast("int")),
            suffix,
        ),
    )
    return F.struct(suffix.alias("suffix"), reg.alias("registrable"))


def domain_rollup(
    df: DataFrame,
    url_col: str = "url",
    suffixes: tuple = PUBLIC_SUFFIXES,
) -> DataFrame:
    """Per-registrable-domain crawl rollup: URL and distinct-host
    counts keyed by the public-suffix registrable domain -- the table
    per-domain politeness/budget decisions read.  One (host-level
    pre-aggregated) shuffle: URLs collapse to (host, n_urls) with
    map-side combine before the domain key exists, so a megahost
    contributes one row to the domain shuffle, not one per URL.
    Hosts whose registrable is NULL (host == suffix) group under the
    suffix itself with is_suffix_only = true.
    """
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(url, r"^https?://([^/#?]+)", 1))
    per_host = df.select(host.alias("host")).groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls")
    )
    rd = registrable_domain(F.col("host"), suffixes)
    keyed = per_host.select(
        "host",
        "n_urls",
        rd.getField("suffix").alias("suffix"),
        rd.getField("registrable").alias("registrable"),
    )
    return (
        keyed.select(
            F.coalesce("registrable", "suffix").alias("domain"),
            F.col("registrable").isNull().alias("is_suffix_only"),
            "suffix",
            "n_urls",
        )
        .groupBy("domain", "is_suffix_only", "suffix")
        .agg(
            F.sum("n_urls").alias("n_urls"),
            F.count("*").cast("long").alias("n_hosts"),
        )
    )
