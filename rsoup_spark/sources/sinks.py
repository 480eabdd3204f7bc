"""Sinks (SURVEY.md §2.2): columnar table writes for extraction output
and crawl state.

Parquet is the sandbox sink; the production path is Iceberg
(``df.writeTo(table).append()`` / MERGE INTO for the seen-set upsert),
gated behind a capability probe since no Iceberg catalog jar ships in
this container.  Layout decisions that matter at 100 TB:

* ``tables_out`` partitions by host-hash bucket, not host -- hosts are
  wildly skewed, buckets are uniform, and table ids remain colocated
  with their host's Bloom shard for cheap joins against crawl state;
* span rows stay nested (one row per doc) rather than exploded -- the
  consumer decides the explosion, and parquet list encoding keeps the
  column compressed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        impl = spark.conf.get("spark.sql.catalog.spark_catalog", "") or ""
        return "iceberg" in impl.lower()
    except Exception:
        return False


def write_tables(
    df: DataFrame,
    path_or_table: str,
    n_buckets: int = 64,
    mode: str = "append",
) -> None:
    """Write extracted tables partitioned by host-hash bucket."""
    out = df.withColumn(
        "host_bucket",
        F.pmod(
            F.xxhash64(F.regexp_extract("url", r"^https?://([^/]+)", 1)),
            F.lit(n_buckets),
        ).cast("int"),
    )
    if path_or_table.startswith(("iceberg:",)):
        out.writeTo(path_or_table.removeprefix("iceberg:")).append()
        return
    out.write.mode(mode).partitionBy("host_bucket").parquet(path_or_table)


def write_spans(df: DataFrame, path: str, mode: str = "append") -> None:
    df.write.mode(mode).parquet(path)


def merge_seen(
    spark: SparkSession, seen_path: str, new_urls: DataFrame
) -> None:
    """Seen-set upsert.  Parquet fallback = union distinct rewrite;
    Iceberg production path = ``MERGE INTO seen USING new ON url``
    (documented, not executable without a catalog here)."""
    old = spark.read.parquet(seen_path)
    old.unionByName(new_urls.select("url")).distinct().write.mode(
        "overwrite"
    ).parquet(seen_path + ".tmp")
    # atomic swap is the caller's job (the crawl engine versions by
    # round directory instead, which is already atomic)
