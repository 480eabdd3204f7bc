"""applyInPandasWithState: per-host state survives across micro-batches."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_host_rate_state_accumulates(spark):
    from rsoup_spark.crawl.fixtures import gen_pages
    from rsoup_spark.operators.extract import extract_spans
    from rsoup_spark.streaming.stateful import host_rate_state

    root = tempfile.mkdtemp(prefix="stateful_")
    in_dir, out_dir, ck = f"{root}/in", f"{root}/out", f"{root}/ck"
    try:
        pages = gen_pages(spark, n_hosts=3, base_pages=4, hot_factor=2,
                          links_per_page=2).persist()
        # two separate input files -> two micro-batches
        pages.limit(6).write.mode("overwrite").parquet(f"{in_dir}/b1")
        pages.write.mode("overwrite").parquet(f"{in_dir}/b2")

        stream = (
            spark.readStream.schema("url string, host string, html string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{in_dir}/*")
        )
        per_doc = extract_spans(stream, "url", "html").select(
            F.regexp_extract("doc_id", r"^https?://([^/]+)", 1).alias("host"),
            F.size("spans").cast("long").alias("n_spans"),
        )
        q = (
            host_rate_state(per_doc)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        out = spark.read.parquet(out_dir)
        # final totals per host must equal the batch total docs per host
        final = (
            out.groupBy("host")
            .agg(F.max("docs_total").alias("docs_total"))
            .collect()
        )
        want = {
            r["host"]: r["n"]
            for r in pages.unionByName(pages.limit(6))
            .groupBy("host")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {r["host"]: r["docs_total"] for r in final}
        assert got == want
        # state crossed micro-batches: some host has >1 output row with
        # increasing totals
        multi = (
            out.groupBy("host").count().where("count > 1").count()
        )
        assert multi > 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
