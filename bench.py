"""Headline benchmark: runs the engine's flagship operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is executed to a noop sink (full pipeline, no driver
collect).  `value` is total wall seconds across headline queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    import __spark_entry__ as entrymod
    from rsoup_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm up JVM + Python workers so the first timed query isn't
    # charged for process spin-up
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x

    run_noop(spark.range(1000).select(_warm("id").alias("id")))

    headline = [
        "ext_spans",
        "ext_spans_rich",
        "ext_tables",
        "ext_links",
        "url_canonicalize",
        "rel_pricing_summary",
        "rel_top_customers",
        "rel_order_rank",
        "rel_events_hourly",
        "rel_region_revenue",
        "rel_rollup_revenue",
        "rel_sessionize",
        "set_except_union",
        "text_stats",
        "dedup_exact",
        "dedup_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_clusters",
        "sim_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "emb_dup_pairs",
        "lang_id",
        "winnow_fingerprints",
        "rel_events_json",
        "pipeline_quality_dedup",
        "graph_pagerank",
        "sample_stratified",
        "rel_quantiles",
        "chunk_documents",
        "pack_chunks",
        "multimodal_fingerprint",
        "multimodal_frame_plan",
        "multimodal_pixel_stats",
        "multimodal_jpeg_stats",
        "multimodal_gif_frames",
        "multimodal_audio_stats",
        "densify_ids",
        "text_repetition",
        "decontaminate",
        "scrub_pii",
        "ext_text_v1",
        "ext_fix_tree",
        "rel_asof_join",
        "rel_range_join",
        "rel_hypertable",
        "evt_funnel",
        "sketch_cms",
        "sketch_hll",
        "text_bm25",
        "text_postings",
        "graph_anchor_text",
        "multimodal_resize",
        "sitemap_ingest",
        "cdx_index",
        "cdx_revisits",
        "dedup_lines",
        "dedup_substrings",
        "gopher_rules",
        "c4_filters",
        "quality_classifier",
        "crawl_traps",
        "semdedup",
        "dedup_incremental",
        "pipeline_corpus_clean",
        "url_filter",
        "recrawl_candidates",
        "url_aliases",
        "domain_rollup",
        "lm_surprise",
        "media_captions",
        "pack_interleaved",
        "revisit_schedule",
        "table_linearize",
        "mix_sources",
    ]

    timings: dict[str, float] = {}
    for name in headline:
        t0 = time.time()
        run_noop(qs[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # extraction throughput: docs/sec over the synthesized corpus
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    docs_per_sec = round(n_docs / max(timings["ext_spans"], 1e-9), 1)

    # reference-workload analogue: the reference macro-bench times
    # full extraction (auto_span+pad+context) over 100 Wikipedia
    # articles (scripts/test_table_extractor.py) -- replicate with the
    # real 380KB mountains fixture replicated 128x through the engine
    wiki_pages_per_sec = None
    wiki_path = ("/root/reference/tests/resources/wikipedia/"
                 "List_of_highest_mountains_on_Earth.html")
    if os.path.exists(wiki_path):
        from pyspark.sql import functions as F2

        from rsoup_spark.operators.extract import extract_tables

        html = open(wiki_path, encoding="utf-8").read()
        n_wiki = 128
        wiki = spark.range(n_wiki).select(
            F2.format_string(
                "https://en.wikipedia.org/wiki/Mountains_%s", "id"
            ).alias("url"),
            F2.lit(html).alias("html"),
        ).repartition(32).persist()
        wiki.count()
        # best-of-3: the 128-page denominator makes single shots swing
        # 2x with the VM's noisy CPU
        runs = []
        for _ in range(3):
            t0 = time.time()
            run_noop(extract_tables(wiki))
            runs.append(time.time() - t0)
        wiki_pages_per_sec = round(n_wiki / min(runs), 1)
        wiki.unpersist()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline operator suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extraction_docs_per_sec": docs_per_sec,
                "n_docs": n_docs,
                "wikipedia_pages_per_sec": wiki_pages_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
