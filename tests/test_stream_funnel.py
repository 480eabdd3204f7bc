"""Streaming funnel (streaming/funnel_stream.py): checkpointed fold
over time-ordered micro-batches == the batch fold."""

import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from rsoup_spark.functions.timeutil import epoch_us_ntz
from rsoup_spark.ops.events import funnel
from rsoup_spark.streaming.funnel_stream import funnel_state

STEPS = ["view", "click", "purchase"]


def _events_df(spark):
    rows = []
    # user 1 converts fully, but the purchase lands in a LATER batch
    # than the view/click -- state must carry (reached=2, t0) across
    rows += [(1, "2024-01-09 00:00:00", "view"),
             (1, "2024-01-09 01:00:00", "click"),
             (1, "2024-01-12 00:00:00", "purchase")]
    # user 2's purchase is outside the window anchored in batch 0
    rows += [(2, "2024-01-02 00:00:00", "view"),
             (2, "2024-01-02 01:00:00", "click"),
             (2, "2024-01-25 00:00:00", "purchase")]
    # user 3 appears only in the last batch
    rows += [(3, "2024-01-22 00:00:00", "view"),
             (3, "2024-01-22 00:00:00", "click")]
    # user 4: the batch-0 click precedes any view and never counts;
    # the batch-1 view then anchors a fresh funnel at reached=1
    rows += [(4, "2024-01-02 00:00:00", "click"),
             (4, "2024-01-12 00:00:00", "view")]
    return spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


@pytest.mark.spark
def test_stream_funnel_equals_batch_fold(spark):
    ev = _events_df(spark)
    batch = {
        r.user_id: (r.reached, r.t_first_us)
        for r in funnel(ev, STEPS, 7 * 86400).collect()
    }

    root = tempfile.mkdtemp(prefix="stream_funnel_")
    in_dir, out_dir, ck = f"{root}/in", f"{root}/out", f"{root}/ck"
    try:
        step_idx = F.array_position(
            F.array(*[F.lit(s) for s in STEPS]), F.col("event_type")
        ).cast("int") - 1
        bucket = (
            F.when(F.col("ts") < F.lit("2024-01-11").cast("timestamp_ntz"), 0)
            .when(F.col("ts") < F.lit("2024-01-21").cast("timestamp_ntz"), 1)
            .otherwise(2)
        )
        prepared = ev.select(
            "user_id",
            epoch_us_ntz(F.col("ts")).alias("t_us"),
            step_idx.alias("s"),
            bucket.alias("b"),
        )
        now = time.time()
        for b in (0, 1, 2):
            sub = f"{in_dir}/b={b}"
            prepared.where(F.col("b") == b).drop("b").coalesce(1).write.mode(
                "overwrite"
            ).parquet(sub)
            for fn in os.listdir(sub):
                os.utime(f"{sub}/{fn}", (now + 30 * b, now + 30 * b))

        stream = (
            spark.readStream.schema(spark.read.parquet(in_dir).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .select("user_id", "t_us", "s")
        )
        q = (
            funnel_state(stream, n_steps=3, window_seconds=7 * 86400)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        out = spark.read.parquet(out_dir)
        final = out.groupBy("user_id").agg(
            F.max("reached").alias("reached"),
            F.max("t_first_us").alias("t_first_us"),
            F.count("*").alias("n_state_rows"),
        )
        got = {
            r.user_id: (r.reached, r.t_first_us, r.n_state_rows)
            for r in final.collect()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    assert {u: v[:2] for u, v in got.items()} == batch
    # cross-batch conversion really did span two state emissions
    assert got[1][2] == 2 and got[1][0] == 3
    # and user 2's reached stays 2: the out-of-window purchase did not
    # advance state even though it arrived in a fresh batch
    assert got[2][0] == 2
    assert got[3][2] == 1
    # user 4: the early click (reached 0 at the time) was correctly
    # skipped; the later-batch view anchored at its own timestamp
    assert got[4][0] == 1 and got[4][1] == 1705017600000000
