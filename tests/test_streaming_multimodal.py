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


class TestPngCodec:
    """Pure-Python PNG codec (ops/png.py): the decode path behind
    decode_image.  Filters 1-4 are produced by a reference forward
    filter here, so decode is pinned against the spec, not against our
    own encoder (which only emits filter 0)."""

    def _forward_filter(self, img, ftype):
        """Reference PNG forward filter (RFC 2083 §6) in plain numpy."""
        import numpy as np

        a = img if img.ndim == 3 else img[:, :, None]
        h, w, ch = a.shape
        a = a.astype(np.int64)
        out = []
        prev = np.zeros((w, ch), np.int64)
        for y in range(h):
            cur = a[y]
            left = np.zeros(ch, np.int64)
            upleft = np.zeros(ch, np.int64)
            row = np.empty((w, ch), np.int64)
            for x in range(w):
                b, c = prev[x], upleft
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = left
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (left + b) >> 1
                else:
                    p = left + b - c
                    pa, pb, pc = (np.abs(p - left), np.abs(p - b),
                                  np.abs(p - c))
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, b, c))
                row[x] = (cur[x] - pred) % 256
                left = cur[x]
                upleft = b
            out.append(bytes([ftype]) + row.astype(np.uint8).tobytes())
            prev = cur
        return b"".join(out)

    def _build_png(self, img, ftype):
        import struct
        import zlib

        import numpy as np

        from rsoup_spark.ops.png import PNG_MAGIC

        a = img if img.ndim == 3 else img[:, :, None]
        h, w, ch = a.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        raw = self._forward_filter(np.asarray(img, np.uint8), ftype)
        return (PNG_MAGIC + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    def test_roundtrip_all_channel_counts(self):
        import numpy as np

        from rsoup_spark.ops.png import decode_png, encode_png

        rng = np.random.default_rng(7)
        for ch in (1, 2, 3, 4):
            shape = (11, 7) if ch == 1 else (11, 7, ch)
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            got = decode_png(encode_png(img))
            assert got.shape == img.shape and (got == img).all(), ch

    def test_decode_every_filter_type(self):
        import numpy as np

        from rsoup_spark.ops.png import decode_png

        rng = np.random.default_rng(11)
        for ch in (1, 3, 4):
            shape = (9, 6) if ch == 1 else (9, 6, ch)
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            for ftype in range(5):
                got = decode_png(self._build_png(img, ftype))
                assert (got == img).all(), (ch, ftype)

    def test_golden_pixels(self):
        import numpy as np

        from rsoup_spark.ops.png import decode_png, encode_png

        img = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
            np.uint8,
        )
        got = decode_png(encode_png(img))
        assert got.tolist() == img.tolist()

    def test_unsupported_flavors_named(self):
        import struct
        import zlib

        import numpy as np
        import pytest as pt

        from rsoup_spark.ops.multimodal import decode_image
        from rsoup_spark.ops.png import PNG_MAGIC, decode_png

        with pt.raises(ValueError, match="magic"):
            decode_png(b"JFIFnotapng")
        with pt.raises(NotImplementedError, match="non-PNG"):
            decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        for depth, color, inter, msg in (
            (16, 0, 0, "16-bit"),
            (8, 3, 0, "palette"),
            (8, 0, 1, "Adam7"),
        ):
            ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0,
                               inter)
            blob = (PNG_MAGIC + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
                    + chunk(b"IEND", b""))
            with pt.raises(NotImplementedError, match=msg):
                decode_png(blob)

    @pytest.mark.spark
    def test_image_pixel_stats_real_decode_in_dataflow(self, spark):
        """Real PNGs flow binary-column -> Arrow batch -> decode ->
        integer stats; non-decodable blobs are dropped, not fatal.
        The same real blobs also ride the byte-level feature and
        fingerprint passes unchanged."""
        import numpy as np

        from rsoup_spark.ops.multimodal import (
            extract_features,
            image_pixel_stats,
            media_fingerprint,
        )
        from rsoup_spark.ops.png import encode_png

        solid = np.full((4, 3, 3), 100, np.uint8)
        grad = np.arange(8, dtype=np.uint8).reshape(2, 4)
        rows = [
            ("png_solid", bytearray(encode_png(solid))),
            ("png_gray", bytearray(encode_png(grad))),
            ("not_png", bytearray(b"JUNKBYTES")),
        ]
        media = spark.createDataFrame(
            rows, "media_id string, data binary"
        ).withColumn("kind", F.lit("image"))
        got = {r["media_id"]: r.asDict()
               for r in image_pixel_stats(media).collect()}
        assert set(got) == {"png_solid", "png_gray"}
        s = got["png_solid"]
        assert (s["width"], s["height"], s["channels"]) == (3, 4, 3)
        assert s["mean_ppm"] == [100 * 1_000_000 // 255] * 3
        g = got["png_gray"]
        assert (g["width"], g["height"], g["channels"]) == (4, 2, 1)
        assert g["mean_ppm"] == [sum(range(8)) * 1_000_000 // (8 * 255)]
        # byte-level passes accept the same real blobs
        assert extract_features(media).count() == 3
        assert media_fingerprint(media).count() == 3
