"""Streaming extraction + multimodal plumbing tests."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.mark.spark
def test_stream_extract_spans_drains_and_matches_batch(spark):
    from rsoup_spark.crawl.fixtures import gen_pages
    from rsoup_spark.operators.extract import extract_spans
    from rsoup_spark.streaming.extract_stream import stream_extract_spans

    root = tempfile.mkdtemp(prefix="stream_")
    in_dir, out_dir, ck = f"{root}/in", f"{root}/out", f"{root}/ck"
    try:
        pages = gen_pages(spark, n_hosts=3, base_pages=4, hot_factor=2,
                          links_per_page=3)
        pages.select("url", "host", "html").write.parquet(in_dir)

        q = stream_extract_spans(spark, in_dir, out_dir, ck,
                                 max_files_per_trigger=2)
        q.awaitTermination()

        streamed = spark.read.parquet(out_dir)
        batch = extract_spans(
            spark.read.parquet(in_dir), "url", "html"
        )
        assert streamed.count() == batch.count()
        # restart with no new input -> no duplicates (exactly-once)
        q2 = stream_extract_spans(spark, in_dir, out_dir, ck)
        q2.awaitTermination()
        assert spark.read.parquet(out_dir).count() == batch.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.mark.spark
def test_multimodal_features_and_frame_plan(spark):
    from rsoup_spark.ops.multimodal import (
        decode_image,
        extract_features,
        fake_feature,
        frame_sample_plan,
        synth_media,
    )
    from rsoup_spark.sources.docs import load_table

    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    media = synth_media(spark, docs)
    assert media.count() == 40  # image + audio per doc

    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: recompute one feature locally
    m0 = media.orderBy("media_id").first()
    f0 = [r for r in rows if r["media_id"] == m0["media_id"]][0]
    assert f0["feature"] == pytest.approx(fake_feature(bytes(m0["data"]), 8))

    plan = frame_sample_plan(media, every_ms=500)
    # audio rows have duration 2000ms -> 5 samples each (0..2000)
    per = plan.groupBy("media_id").count().collect()
    assert all(r["count"] == 5 for r in per)

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_media_fingerprint_is_feature_integer_surface(spark):
    """fp is the integer-exact surface of fake_feature: feature[0]
    equals float32(fp / 2**31 - 1) for every media row, so the oracled
    fingerprint query certifies the same bytes the feature UDF sees."""
    import numpy as np

    from rsoup_spark.ops.multimodal import (
        extract_features,
        media_fingerprint,
        synth_media,
    )
    from rsoup_spark.sources.docs import load_table

    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    media = synth_media(spark, docs)
    fps = {r["media_id"]: r["fp"] for r in media_fingerprint(media).collect()}
    feats = {
        r["media_id"]: r["feature"][0]
        for r in extract_features(media, dim=8).collect()
    }
    assert set(fps) == set(feats) and fps
    for mid, fp in fps.items():
        assert 0 <= fp < 2 ** 32
        assert feats[mid] == np.float32(fp / 2 ** 31 - 1.0), mid
