"""Sink layout tests: host-bucket partitioned table writes."""

import shutil
import tempfile
from pathlib import Path

import pytest


@pytest.mark.spark
def test_write_tables_host_bucketed(spark):
    from rsoup_spark.operators.extract import extract_tables
    from rsoup_spark.sources.docs import synth_html_docs
    from rsoup_spark.sources.sinks import write_tables

    from tests.conftest import SF_SMALL

    out = tempfile.mkdtemp(prefix="sink_")
    try:
        docs = synth_html_docs(spark, SF_SMALL).limit(100)
        tables = extract_tables(docs)
        write_tables(tables, out, n_buckets=8, mode="overwrite")
        parts = sorted(p.name for p in Path(out).glob("host_bucket=*"))
        assert parts and all(p.startswith("host_bucket=") for p in parts)
        back = spark.read.parquet(out)
        assert back.count() == tables.count()
        # partition pruning: reading one bucket scans one directory
        one = back.where("host_bucket = %s" % parts[0].split("=")[1])
        assert one.count() > 0 or len(parts) > 1
    finally:
        shutil.rmtree(out, ignore_errors=True)
