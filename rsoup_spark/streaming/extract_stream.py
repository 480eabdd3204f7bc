"""Structured Streaming surface for continuous extraction.

The crawl loop itself stays an iterative-batch driver (deterministic
crawl-order equality needs round barriers -- SURVEY.md §2.2), but the
*extraction* side is exposed as a stream: a directory of page parquet
files (e.g. fetcher output batches) is consumed incrementally, spans
are extracted per micro-batch, and results append to a sink with
exactly-once file semantics via the checkpoint.

    q = stream_extract_spans(spark, in_dir, out_dir, ckpt_dir)
    q.processAllAvailable(); q.stop()        # drain-once mode
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.extract import extract_spans
from ..sources.docs import PAGE_TEMPLATE  # noqa: F401  (re-export surface)

PAGE_INPUT_SCHEMA = "url string, host string, html string"


def stream_extract_spans(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """readStream(parquet pages) -> extract spans -> append parquet."""
    pages = (
        spark.readStream.schema(PAGE_INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    spans = extract_spans(pages, "url", "html")
    return (
        spans.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_link_rates(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> StreamingQuery:
    """Windowed per-host discovery rates with a watermark for late data:
    the streaming-aggregation surface (watermark + tumbling window)."""
    pages = (
        spark.readStream.schema(
            PAGE_INPUT_SCHEMA + ", fetch_ts timestamp"
        ).parquet(input_dir)
    )
    spans = extract_spans(pages, "url", "html")
    hosts = spans.select(
        F.regexp_extract("doc_id", r"^https?://([^/]+)", 1).alias("host"),
        F.size("spans").alias("n_spans"),
        F.current_timestamp().alias("ts"),
    )
    agg = (
        hosts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), "host")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_spans").alias("spans"),
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
