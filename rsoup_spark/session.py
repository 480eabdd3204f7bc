"""SparkSession factory with the engine's scale defaults.

Design notes (SURVEY.md §4):
* AQE on -- runtime shuffle coalescing + skew-join splitting.
* Arrow on, with byte-bounded batches: HTML documents can be MBs each,
  so `maxBytesPerBatch` (not a tiny record cap -- that strangles
  small-row UDF stages with per-batch overhead) bounds Python-worker
  memory; the record cap stays high for throughput.
* shuffle partitions scale with cores so the N -> 4N scaling-efficiency
  target holds (BASELINE.md protocol); on a real cluster this would be
  executors * cores * 2-3.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_MAX_RECORDS = 10_000
ARROW_MAX_BYTES = "32m"


def get_spark(
    app_name: str = "rsoup-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        cores = cpus if n in ("", "*") else int(n)
        shuffle_partitions = max(8, cores * 2)

    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-based coalescing (not parallelism-first): small post-
        # shuffle stages collapse to few real tasks instead of one
        # micro-task per slot; scale-adaptive because the target is a
        # byte size, not a task count
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "false"),
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS),
        )
        .config("spark.sql.execution.arrow.maxBytesPerBatch", ARROW_MAX_BYTES)
        .config("spark.sql.session.timeZone", "UTC")
        # local[N] runs the driver AND all N task slots in one JVM: 8g
        # gave 32 concurrent tasks ~256 MB each at bench core counts.
        # 16g keeps headroom at larger scale factors; still env-tunable
        # (on a real cluster the executors carry their own memory).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
