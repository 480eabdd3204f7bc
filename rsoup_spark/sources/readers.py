"""Document readers beyond parquet.

Mirrors the reference's input surfaces (SURVEY.md §2.2 scans/sources):
local HTML files (tests/main.rs:10-21), jsonl article dumps
(scripts/test_table_extractor.py:10-13), single-URL HTTP fetch
(rsoup/fetch_tables.py:6-22) -- each re-expressed as a DataFrame source
so extraction operators compose on top.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_html_dir(spark: SparkSession, path: str,
                  glob: str = "*.html") -> DataFrame:
    """Directory of HTML files -> (url, html).  Uses the binaryFile
    source so Spark splits the listing across executors; bytes decode
    JVM-side."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path").alias("url"),
            F.decode("content", "utf-8").alias("html"),
        )
    )


def load_jsonl_docs(
    spark: SparkSession,
    path: str,
    url_field: str = "url",
    html_field: str = "html",
) -> DataFrame:
    """JSONL article dump -> (url, html).  Schema is pinned so the scan
    never runs schema inference over 100TB of lines."""
    return (
        spark.read.schema(f"{url_field} string, {html_field} string")
        .json(path)
        .select(
            F.col(url_field).alias("url"), F.col(html_field).alias("html")
        )
    )


def fetch_tables(
    url: str,
    auto_span: bool = True,
    auto_pad: bool = True,
    extract_context: bool = True,
    fetch: Optional[Callable[[str], str]] = None,
):
    """Single-URL convenience, API-compatible with the reference's
    ``rsoup.fetch_tables`` (fetch_tables.py:6-22).  Driver-side only --
    the distributed path is the crawl engine."""
    if fetch is None:
        def fetch(u: str) -> str:
            import requests

            resp = requests.get(u)
            assert resp.status_code == 200, f"HTTP {resp.status_code}"
            return resp.text

    from ..functions.table import TableExtractor

    html = fetch(url)
    return TableExtractor().extract(
        url, html, auto_span, auto_pad, extract_context
    )
