"""spark-submit smoke job (north_rule deployment mode):

    cd /root/repo && zip -qr /tmp/rsoup_spark.zip rsoup_spark
    cd /tmp && spark-submit --master local[4] \
        --py-files /tmp/rsoup_spark.zip /root/repo/tools/submit_smoke.py

Imports the engine ONLY from --py-files (no repo path on sys.path),
generates a small synthetic web, runs extraction + one frontier round,
prints one JSON line.
"""

import json
import time

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("rsoup-submit-smoke")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

from rsoup_spark.crawl.fixtures import gen_pages  # noqa: E402
from rsoup_spark.operators.extract import (  # noqa: E402
    extract_spans,
    harvest_canonical_links,
)

pages = gen_pages(spark, n_hosts=4, base_pages=10, hot_factor=2,
                  links_per_page=4).persist()
n = pages.count()
t0 = time.time()
spans = extract_spans(pages, "url", "html")
n_spans = spans.count()
links = harvest_canonical_links(pages, "url", "html").count()
print(json.dumps({
    "submitted_via": "spark-submit --py-files",
    "pages": n,
    "span_rows": n_spans,
    "links": links,
    "sec": round(time.time() - t0, 2),
}))
spark.stop()
