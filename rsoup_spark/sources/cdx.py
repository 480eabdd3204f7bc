"""CDX capture index: SURT-keyed, time-ordered index over crawl captures.

Every large web archive (Common Crawl, Internet Archive) publishes a
CDX index next to its WARCs: one row per capture, keyed by the SURT
(Sort-friendly URI Reordering Transform) of the URL plus the capture
timestamp, so that all captures of one page — and of one host, and of
one domain — are lexicographically adjacent.  Replay and analytics
then find `example.com/*` with a range scan instead of a full pass.

SURT here (documented variant, matching the common pywb/OpenWayback
canonicalization):

  ``https://www.Sub.Example.COM:8080/A/b?b=2&a=1``
    -> ``com,example,sub:8080)/A/b?a=1&b=2``

* scheme dropped, host lowercased, leading ``www.`` stripped;
* host dot-components reversed and comma-joined (non-default port
  kept after the reversed host);
* ``)`` then the path verbatim (case-significant per RFC 3986);
* query parameters sorted so parameter order doesn't split captures.

The whole transform is built from JVM expressions (split / reverse /
array_join / substring_index) — no Python in the hot path, the key
computation rides whole-stage codegen with the scan.

Scale shape: the index is produced with ``repartitionByRange`` on
(surt, ts) + ``sortWithinPartitions``, i.e. globally range-ordered
shards; written as parquet, every shard carries (min, max) surt in
its footer so a prefix lookup prunes to O(1) shards.  ``cdx_lookup``
expresses the prefix probe as a sargable range predicate
(``surt >= p AND surt < p || chr(255)``), which Spark pushes into the
parquet scan.

Reference semantics: CDX(J) file format as published by Common Crawl
/ IIPC; no reference-repo counterpart (rsoup has no archive sources).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: columns a capture table must carry (the WARC reader provides them)
CAPTURE_COLS = ("url", "ts", "status", "mime", "digest",
                "filename", "offset", "length")


def surt_key(url) -> Column:
    """URL column -> SURT key column (pure JVM expressions).

    Assumes http(s) URLs of the shape the crawl normalizer emits
    (``canonicalize_url``: lowercase host, non-empty path).  Raw URLs
    also key correctly: hosts are lowercased again, userinfo is
    stripped, a query with no path slash ("http://h?a=1") still parses
    as host + query, and fragments are dropped.  Paths keep their case
    (RFC 3986: path is case-significant).
    """
    url = F.col(url) if isinstance(url, str) else url
    # strip scheme -> "[user@]host[:port][/path][?query][#frag]"
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    # authority ends at the first of '/', '?', '#' (a raw
    # "http://example.com?a=1" has a query but no path slash); strip
    # userinfo so "user:pw@host/" keys by host, not by credential
    authority = F.regexp_extract(rest, r"^[^/?#]*", 0)
    hostport = F.lower(F.regexp_replace(authority, r"^[^/?#]*@", ""))
    # path+query with its leading "/" ("" when the URL had no path),
    # fragment dropped (never part of the capture identity)
    pathq = F.regexp_replace(
        F.regexp_replace(rest, r"^[^/?#]*", ""), r"#.*$", "")
    host = F.regexp_replace(
        F.substring_index(hostport, ":", 1), r"^www\.", "")
    port = F.when(
        F.instr(hostport, ":") > 0,
        F.concat(F.lit(":"), F.substring_index(hostport, ":", -1)),
    ).otherwise(F.lit(""))
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.substring_index(pathq, "?", 1)
    query = F.when(
        F.instr(pathq, "?") > 0,
        F.concat(
            F.lit("?"),
            F.array_join(
                F.array_sort(
                    F.split(F.substring_index(pathq, "?", -1), "&")
                ),
                "&",
            ),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        rev_host, port, F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path), query,
    )


def cdx_index(captures: DataFrame, shards: int | None = None) -> DataFrame:
    """Capture rows -> CDX index rows, globally range-ordered by
    (surt, ts).

    Input needs ``url`` and ``ts`` plus whatever CAPTURE_COLS it has
    (missing ones null out).  One range shuffle; each output shard is
    sorted, so a parquet write yields prefix-prunable index shards.
    """
    cols = [F.col(c) if c in captures.columns else F.lit(None).alias(c)
            for c in CAPTURE_COLS]
    idx = captures.select(surt_key("url").alias("surt"), *cols)
    if shards is not None:
        idx = idx.repartitionByRange(shards, "surt", "ts")
    else:
        idx = idx.repartitionByRange("surt", "ts")
    return idx.sortWithinPartitions("surt", "ts")


def cdx_lookup(index: DataFrame, url_prefix: str) -> DataFrame:
    """Prefix probe: all captures whose SURT starts with the SURT of
    ``url_prefix``.  Expressed as a sargable range predicate so the
    parquet reader prunes shards by footer min/max instead of scanning
    the index."""
    from rsoup_spark.functions.urlnorm import canonicalize_url

    canon = canonicalize_url(url_prefix) or url_prefix
    # compute the prefix's SURT on a literal one-row frame (JVM expr,
    # evaluated once at plan time via collect of a single value)
    spark = index.sparkSession
    lo = spark.range(1).select(
        surt_key(F.lit(canon)).alias("s")).head()[0]
    hi = lo + "￿"
    return index.filter((F.col("surt") >= lo) & (F.col("surt") < hi))


def cdx_revisits(index: DataFrame) -> DataFrame:
    """Mark revisit captures: within one SURT key (time order), a
    capture whose payload digest equals the previous capture's is a
    ``revisit`` — archives store it as a slim revisit record pointing
    at ``orig_ts``, the timestamp of the first capture of the current
    same-digest run (the record the replay should serve).  Documented
    variant: run semantics (consecutive identical digests), the shape
    wayback-style within-crawl digest dedup produces.

    Pure JVM window pass over the (surt, ts) order the index already
    has: lag() for the revisit flag, then a run-start carry
    (max-by-accumulation via last() over the preceding frame) for
    orig_ts.  One shuffle on surt — the same key the index is
    range-partitioned by, so on an already-built index AQE keeps this
    co-located.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("surt").orderBy("ts")
    prev_digest = F.lag("digest").over(w)
    # null-safe: a null digest (no payload hash recorded) never marks
    # a revisit, and `null == x` must not leak a null flag
    is_revisit = prev_digest.isNotNull() & F.col("digest").isNotNull() \
        & (F.col("digest") == prev_digest)
    run_start = F.when(~is_revisit, F.col("ts"))
    return (
        index.withColumn("is_revisit", is_revisit)
        .withColumn(
            "orig_ts",
            F.last(run_start, ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )


def recrawl_candidates(
    entries: DataFrame,
    captures: DataFrame,
    url_col: str = "url",
    lastmod_col: str = "lastmod",
    ts_col: str = "ts",
) -> DataFrame:
    """Sitemap-driven recrawl scheduling: join declared freshness
    (sitemap ``lastmod``) against observed coverage (capture history)
    and emit the URLs worth fetching again -- the standard way an
    archive-aware crawler spends its politeness budget on pages that
    actually changed instead of blind TTLs.

    A URL is a candidate iff it was never captured, or its declared
    ``lastmod`` is strictly later than its latest capture.  Output:
    (url, lastmod, last_capture, reason 'never'|'stale',
    days_stale = lastmod - last_capture in days, NULL for 'never').
    Feed the result to ``CrawlEngine.expire(..., reenqueue=True)`` --
    staleness makes a natural re-enqueue score.

    Scale shape: the capture history collapses to one row per URL with
    a map-side-combined max BEFORE the join, so the join carries
    |sitemap| + |distinct urls| rows, never the capture log; both
    sides key on url (co-partitioned exchange, broadcastable when the
    sitemap side is one site's).
    """
    last = captures.groupBy(F.col(url_col).alias("url")).agg(
        F.max(ts_col).alias("last_capture")
    )
    j = entries.select(
        F.col(url_col).alias("url"), F.col(lastmod_col).alias("lastmod")
    ).join(last, "url", "left")
    never = F.col("last_capture").isNull()
    stale = ~never & (F.col("lastmod") > F.col("last_capture"))
    return (
        j.where(never | stale)
        .select(
            "url",
            "lastmod",
            "last_capture",
            F.when(never, F.lit("never")).otherwise(F.lit("stale"))
            .alias("reason"),
            F.when(
                stale, F.datediff(F.col("lastmod"), F.col("last_capture"))
            ).cast("int").alias("days_stale"),
        )
    )


def revisit_schedule(
    captures: DataFrame,
    min_days: int = 1,
    max_days: int = 64,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Change-rate-driven revisit scheduling (the Cho & Garcia-Molina
    2003 freshness idea in its integer-exact form): estimate each
    URL's change interval from its own capture history -- a change is
    a capture whose digest differs from the previous capture's -- and
    schedule the next fetch accordingly.  Where ``recrawl_candidates``
    trusts DECLARED freshness (sitemap lastmod), this infers it from
    OBSERVED behavior, so the two compose: declared when available,
    inferred for the long tail that has no sitemap.

    Per URL: n_caps, n_changes, span_days (first to last capture),
    interval_days = max_days for never-changed URLs else
    clamp(span_days DIV n_changes, min_days, max_days) -- integer
    division, no float decay constants -- and next_fetch = last
    capture + interval_days.

    Scale shape: one window (url, ts) for the digest lag + one
    groupBy(url) with map-side combine; both key on url so the
    exchange is reused.  The output is one row per distinct URL --
    frontier-priority-queue sized, not capture-log sized.
    """
    from pyspark.sql.window import Window

    marked = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
    ).withColumn(
        "__chg",
        (
            F.col("digest")
            != F.lag("digest").over(
                Window.partitionBy("url").orderBy("ts")
            )
        ).cast("int"),
    )
    agg = marked.groupBy("url").agg(
        F.count("*").cast("long").alias("n_caps"),
        F.coalesce(F.sum("__chg"), F.lit(0)).cast("long").alias(
            "n_changes"
        ),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    span = F.datediff(F.col("last_ts"), F.col("first_ts")).cast("long")
    interval = F.when(
        F.col("n_changes") == 0, F.lit(int(max_days))
    ).otherwise(
        F.greatest(
            F.lit(int(min_days)),
            F.least(
                F.lit(int(max_days)),
                F.expr("datediff(last_ts, first_ts) DIV n_changes"),
            ),
        )
    ).cast("long")
    return (
        agg.withColumn("span_days", span)
        .withColumn("interval_days", interval)
        .select(
            "url",
            "n_caps",
            "n_changes",
            "span_days",
            "interval_days",
            F.expr(
                "timestampadd(DAY, CAST(interval_days AS INT), last_ts)"
            ).alias("next_fetch"),
        )
    )
