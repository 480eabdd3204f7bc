"""Streaming sessionization (streaming/session_stream.py): the
checkpointed gap fold over time-ordered micro-batches == the batch
window scan (q_rel_sessionize semantics)."""

import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rsoup_spark.functions.timeutil import epoch_us_ntz
from rsoup_spark.streaming.session_stream import sessionize_state

GAP_S = 1800


def _events_df(spark):
    rows = []
    # user 1: one session that SPANS the batch-0/batch-1 boundary
    # (last batch-0 event 23:50, first batch-1 event 00:10 -- a
    # 20-min gap < 30 min, but only if state carried last_us across)
    rows += [(1, 10, "2024-01-10 23:30:00"),
             (1, 11, "2024-01-10 23:50:00"),
             (1, 12, "2024-01-11 00:10:00"),
             (1, 13, "2024-01-11 09:00:00")]   # >30 min after 00:10 -> new
    # user 2: boundary-adjacent events exactly 30 min apart -- the
    # strict > rule keeps them ONE session across the boundary
    rows += [(2, 20, "2024-01-10 23:45:00"),
             (2, 21, "2024-01-11 00:15:00")]
    # user 3: three sessions, one per batch, plus an equal-timestamp
    # pair ordered by event_id inside batch 2
    rows += [(3, 30, "2024-01-05 09:00:00"),
             (3, 31, "2024-01-15 09:00:00"),
             (3, 33, "2024-01-25 09:00:00"),
             (3, 32, "2024-01-25 09:00:00")]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def _batch_sessions(ev):
    """The q_rel_sessionize scan, inlined."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    epoch = epoch_us_ntz(F.col("ts"))
    gaps = ev.select(
        "user_id", "event_id", "ts",
        F.when(epoch - F.lag(epoch, 1, 0).over(w) > GAP_S * 1_000_000, 1)
        .otherwise(0).alias("new_session"),
    )
    sess = gaps.withColumn(
        "session_no",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        epoch_us_ntz(F.min("ts")).alias("start_us"),
        epoch_us_ntz(F.max("ts")).alias("end_us"),
    )


@pytest.mark.spark
def test_stream_sessionize_equals_batch_scan(spark):
    ev = _events_df(spark)
    batch = {
        (r.user_id, r.session_no): (r.n_events, r.start_us, r.end_us)
        for r in _batch_sessions(ev).collect()
    }

    root = tempfile.mkdtemp(prefix="stream_sess_")
    in_dir, out_dir, ck = f"{root}/in", f"{root}/out", f"{root}/ck"
    try:
        bucket = (
            F.when(F.col("ts") < F.lit("2024-01-11").cast("timestamp_ntz"), 0)
            .when(F.col("ts") < F.lit("2024-01-21").cast("timestamp_ntz"), 1)
            .otherwise(2)
        )
        prepared = ev.select(
            "user_id", "event_id",
            epoch_us_ntz(F.col("ts")).alias("t_us"),
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
            .select("user_id", "event_id", "t_us")
        )
        q = (
            sessionize_state(stream, gap_seconds=GAP_S)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        out = spark.read.parquet(out_dir)
        final = out.groupBy("user_id", "session_no").agg(
            F.count("*").alias("n_batches"),
            F.max("n_events").alias("n_events"),
            F.max("start_us").alias("start_us"),
            F.max("end_us").alias("end_us"),
        )
        got = {
            (r.user_id, r.session_no):
                (r.n_batches, r.n_events, r.start_us, r.end_us)
            for r in final.collect()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    assert {k: v[1:] for k, v in got.items()} == batch
    # user 2's single session emitted from BOTH batches: the 30-min
    # boundary pair merged only because last_us survived the batch cut
    assert got[(2, 1)][0] == 2 and got[(2, 1)][1] == 2
    # user 1: session 1 spans the boundary (two emissions, 3 events
    # total -- the 20-min boundary gap merged only via carried state);
    # session 2 lives entirely in batch 1
    assert got[(1, 1)][:2] == (2, 3) and got[(1, 2)][0] == 1
    # user 3: three sessions, one emission each; the equal-timestamp
    # pair collapsed into one 2-event session
    assert got[(3, 3)] == (1, 2, got[(3, 3)][2], got[(3, 3)][3])
