"""Document sources.

``synth_html_docs`` turns the driver's ``documents`` parquet into a
deterministic HTML page store *entirely with JVM-side expressions*
(``format_string``/``concat`` -- whole-stage codegen, no Python), so the
extraction operators have a reproducible input whose expected output is
expressible in ANSI SQL for the DuckDB oracle.

Page template (per doc):
  <h1>Doc {doc_id}</h1>
  <p>{text}</p>
  <table> 2x2: headers lang/source, values {lang}/{source} </table>
  <p>Tags: <a href="/{source}/{doc_id}">{lang}</a> <img src="/img/{doc_id}.png"/></p>

The driver's documents.text is plain ASCII (no HTML metachars, no
tabs/newlines) -- asserted in tests -- so no escaping layer is needed
for the oracle to reason about the round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_TEMPLATE = (
    "<html><body>"
    "<h1>Doc %s</h1>"
    "<p>%s</p>"
    '<table class="doc-meta" data-doc="%s"><tbody>'
    "<tr><th>lang</th> <th>source</th></tr> "
    "<tr><td>%s</td> <td>%s</td></tr>"
    "</tbody></table>"
    '<p>Tags: <a href="/%s/%s">%s</a> <img src="/img/%s.png"/></p>'
    "</body></html>"
)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, split: bool = True
) -> DataFrame:
    """Read one testdata table.

    The local sf* tables are single small parquet files, so the scan
    yields one partition and every downstream Python stage would run
    on one core.  At production scale the scan is already split by
    ``spark.sql.files.maxPartitionBytes``; ``split=True`` reproduces
    that locally with a round-robin repartition when the scan has
    fewer partitions than the cluster has slots.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    par = spark.sparkContext.defaultParallelism
    # inputFiles() is driver-side file listing; the previous
    # df.rdd.getNumPartitions() forced a full DataFrame->RDD plan
    # conversion on every table load
    if split and len(df.inputFiles()) < par:
        df = df.repartition(par)
    return df


RICH_TEMPLATE = (
    "<html><body>"
    "<h1>Doc %s</h1>"
    "<h2>Keywords</h2>"
    "<ul><li>%s</li> <li>%s</li> <li>%s</li></ul>"
    "<p>%s</p>"
    '<p>More: <a href="//cdn.test/%s">cdn</a> <b>%s</b> '
    '<img src="/thumb/%s.jpg"/></p>'
    "</body></html>"
)


def synth_rich_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Richer page shape: keyword list (keep-tags ol/ul/li), two heading
    levels, scheme-relative link, bold, image -- exercises the list /
    heading / media span semantics in the correctness gate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.format_string(
            "https://rich.test/%s", F.col("doc_id")
        ).alias("url"),
        F.format_string(
            RICH_TEMPLATE,
            F.col("doc_id"),
            toks.getItem(0),
            toks.getItem(1),
            toks.getItem(2),
            F.col("text"),
            F.col("doc_id"),
            F.col("lang"),
            F.col("doc_id"),
        ).alias("html"),
        "lang",
        "text",
    )


def synth_html_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (doc_id, url, html, lang, source, text)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.format_string(
            "https://docs.test/%s/%s", F.col("source"), F.col("doc_id")
        ).alias("url"),
        F.format_string(
            PAGE_TEMPLATE,
            F.col("doc_id"),
            F.col("text"),
            F.col("doc_id"),
            F.col("lang"),
            F.col("source"),
            F.col("source"),
            F.col("doc_id"),
            F.col("lang"),
            F.col("doc_id"),
        ).alias("html"),
        "lang",
        "source",
        "text",
    )
