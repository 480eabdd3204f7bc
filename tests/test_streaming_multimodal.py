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

    def test_malformed_flavors_named(self):
        import struct
        import zlib

        import pytest as pt

        from rsoup_spark.ops.multimodal import decode_image
        from rsoup_spark.ops.png import PNG_MAGIC, decode_png, png_chunk

        with pt.raises(ValueError, match="magic"):
            decode_png(b"JFIFnotapng")
        # JPEG now decodes; a truncated one is malformed, not gated
        with pt.raises(ValueError):
            decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
        # WebP now routes to the VP8L codec: a header-only RIFF is
        # malformed (truncated), a well-formed LOSSY chunk is the
        # named env gate, and non-RIFF formats keep the generic gate
        with pt.raises(ValueError, match="without image chunk"):
            decode_image(b"RIFF\x04\x00\x00\x00WEBP")
        lossy = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
                 + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
        with pt.raises(NotImplementedError, match="lossy"):
            decode_image(lossy)
        with pt.raises(NotImplementedError, match="non-PNG"):
            decode_image(b"\x00\x00\x00\x1cftypavif....")

        for depth, color, inter, msg in (
            (8, 3, 0, "PLTE"),        # palette without a palette chunk
            (8, 7, 0, "color type"),  # invalid color type
            (16, 3, 0, "depth"),      # 16-bit palette is not valid PNG
            (8, 0, 2, "interlace"),   # invalid interlace method
        ):
            ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0,
                               inter)
            blob = (PNG_MAGIC + png_chunk(b"IHDR", ihdr)
                    + png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
                    + png_chunk(b"IEND", b""))
            with pt.raises(ValueError, match=msg):
                decode_png(blob)

    def test_palette_png_decodes_with_and_without_trns(self):
        import numpy as np

        from rsoup_spark.ops.png import decode_png, encode_png_indexed

        pal = np.array(
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8
        )
        rng = np.random.default_rng(3)
        for depth in (1, 2, 4, 8):
            n = min(1 << depth, 4)
            idx = rng.integers(0, n, size=(5, 7), dtype=np.uint8)
            got = decode_png(encode_png_indexed(idx, pal[:n], depth=depth))
            assert got.shape == (5, 7, 3)
            assert (got == pal[:n][idx]).all(), depth
        # tRNS: first two entries translucent, rest default opaque
        idx = rng.integers(0, 4, size=(4, 4), dtype=np.uint8)
        got = decode_png(
            encode_png_indexed(idx, pal, trns=bytes([0, 128]), depth=8)
        )
        assert got.shape == (4, 4, 4)
        assert (got[:, :, :3] == pal[idx]).all()
        alpha = np.array([0, 128, 255, 255], np.uint8)
        assert (got[:, :, 3] == alpha[idx]).all()

    def test_16bit_and_subbyte_gray_roundtrip(self):
        import numpy as np

        from rsoup_spark.ops.png import decode_png, encode_png

        rng = np.random.default_rng(5)
        for ch in (1, 3, 4):
            shape = (6, 5) if ch == 1 else (6, 5, ch)
            img = rng.integers(0, 1 << 16, size=shape, dtype=np.uint16)
            got = decode_png(encode_png(img))
            assert got.dtype == np.uint16
            assert got.shape == img.shape and (got == img).all(), ch
        # sub-byte grayscale scales exactly to 0..255
        from rsoup_spark.ops.png import PNG_MAGIC, png_chunk
        import struct
        import zlib

        bits = np.array([[1, 0, 1, 0, 1, 1, 0, 0, 1]], np.uint8)  # w=9
        packed = np.packbits(bits, axis=1)
        ihdr = struct.pack(">IIBBBBB", 9, 1, 1, 0, 0, 0, 0)
        blob = (PNG_MAGIC + png_chunk(b"IHDR", ihdr)
                + png_chunk(b"IDAT",
                            zlib.compress(b"\x00" + packed.tobytes()))
                + png_chunk(b"IEND", b""))
        assert decode_png(blob).tolist() == [
            [255, 0, 255, 0, 255, 255, 0, 0, 255]
        ]

    def test_adam7_interlaced_decode(self):
        import struct
        import zlib

        import numpy as np

        from rsoup_spark.ops.png import PNG_MAGIC, decode_png, png_chunk
        from rsoup_spark.ops.png import _ADAM7

        rng = np.random.default_rng(9)
        for h, w, ch in ((9, 10, 3), (8, 8, 1), (3, 2, 4), (1, 1, 1)):
            shape = (h, w) if ch == 1 else (h, w, ch)
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            a = img if img.ndim == 3 else img[:, :, None]
            raw = b""
            for x0, y0, dx, dy in _ADAM7:
                sub = a[y0::dy, x0::dx]
                if sub.shape[0] == 0 or sub.shape[1] == 0:
                    continue
                raw += b"".join(
                    b"\x00" + sub[y].tobytes()
                    for y in range(sub.shape[0])
                )
            color = {1: 0, 3: 2, 4: 6}[ch]
            ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
            blob = (PNG_MAGIC + png_chunk(b"IHDR", ihdr)
                    + png_chunk(b"IDAT", zlib.compress(raw))
                    + png_chunk(b"IEND", b""))
            got = decode_png(blob)
            assert got.shape == img.shape and (got == img).all(), (h, w, ch)

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

    def test_resize_image_nearest_box_and_reencode(self, spark):
        """Hand-computed resize semantics: nearest picks src = floor(
        dst*n/n'), box is the exact mean pool, reencode emits a PNG
        whose decoded pixels equal the resample; non-integer box
        factors and junk blobs drop rows (quarantine semantics)."""
        import numpy as np

        from rsoup_spark.ops.multimodal import resize_image
        from rsoup_spark.ops.png import decode_png, encode_png

        # 4x4 grayscale with distinct quadrant values
        img = np.array(
            [[0, 0, 10, 10],
             [0, 0, 10, 10],
             [20, 20, 40, 40],
             [20, 20, 40, 40]], dtype=np.uint8)
        rgb = np.stack([img, img + 1, img + 2], axis=2).astype(np.uint8)
        media = spark.createDataFrame(
            [("g", bytearray(encode_png(img))),
             ("c", bytearray(encode_png(rgb))),
             ("junk", bytearray(b"NOPE"))],
            "media_id string, data binary",
        )

        # nearest 4x4 -> 2x2 picks rows/cols 0,2 -> [[0,10],[20,40]]
        near = {r["media_id"]: r.asDict()
                for r in resize_image(media, 2, 2).collect()}
        assert set(near) == {"g", "c"}
        assert (near["g"]["width"], near["g"]["height"]) == (2, 2)
        assert near["g"]["mean_ppm"] == [
            (0 + 10 + 20 + 40) * 1_000_000 // (4 * 255)]
        assert near["c"]["channels"] == 3
        assert near["c"]["mean_ppm"][1] == \
            (0 + 10 + 20 + 40 + 4) * 1_000_000 // (4 * 255)

        # box 4x4 -> 2x2 averages each quadrant exactly
        box = {r["media_id"]: r.asDict()
               for r in resize_image(media, 2, 2, method="box").collect()}
        assert box["g"]["mean_ppm"] == [
            (0 + 10 + 20 + 40) * 1_000_000 // (4 * 255)]

        # nearest upscale 4x4 -> 8x8 repeats every pixel 2x2: same mean
        up = {r["media_id"]: r.asDict()
              for r in resize_image(media, 8, 8).collect()}
        assert up["g"]["mean_ppm"] == [
            (0 + 0 + 10 + 10 + 0 + 0 + 10 + 10
             + 20 + 20 + 40 + 40 + 20 + 20 + 40 + 40)
            * 4 * 1_000_000 // (64 * 255)]

        # reencode: the data column is a decodable PNG of the resample
        re = {r["media_id"]: r.asDict()
              for r in resize_image(media, 2, 2, reencode=True).collect()}
        assert np.array_equal(
            decode_png(bytes(re["g"]["data"])),
            np.array([[0, 10], [20, 40]], dtype=np.uint8),
        )
        got_rgb = decode_png(bytes(re["c"]["data"]))
        assert got_rgb.shape == (2, 2, 3) and got_rgb[1, 1, 2] == 42

        # box with a non-integer factor quarantine-drops the row
        # (never job-fatal on a mixed-size crawl corpus) -- 4x4 -> 3x3
        # has no integer factor, so every decodable image drops too
        assert resize_image(media, 3, 3, method="box").count() == 0
        # mixed corpus: only the integer-factor image survives
        assert {r["media_id"] for r in
                resize_image(media, 1, 1, method="box").collect()
                } == {"g", "c"}


class TestGifCodec:
    """Pure-Python GIF LZW codec (ops/gif.py): roundtrip, animation
    compositing, transparency, disposal, interlace, 256-color."""

    def test_single_frame_roundtrip(self):
        import numpy as np

        from rsoup_spark.ops.gif import decode_gif, encode_gif

        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
             [10, 20, 30]], np.uint8,
        )
        idx = np.random.default_rng(2).integers(
            0, 5, size=(7, 9), dtype=np.uint8
        )
        frames = decode_gif(encode_gif([idx], pal))
        assert len(frames) == 1
        f, d = frames[0]
        assert f.shape == (7, 9, 4) and d == 0
        assert (f[:, :, :3] == pal[idx]).all()
        assert (f[:, :, 3] == 255).all()

    def test_animation_delays_and_frames(self):
        import numpy as np

        from rsoup_spark.ops.gif import decode_gif, encode_gif

        pal = np.array(
            [[0, 0, 0], [1, 2, 3], [9, 9, 9], [200, 100, 50]], np.uint8
        )
        fr = [np.full((4, 4), v, np.uint8) for v in (0, 2, 3)]
        frames = decode_gif(
            encode_gif(fr, pal, delays_ms=[100, 250, 40])
        )
        assert [d for _, d in frames] == [100, 250, 40]
        for (got, _), idx in zip(frames, fr):
            assert (got[:, :, :3] == pal[idx]).all()

    def test_transparency_composites_over_previous_frame(self):
        import numpy as np

        from rsoup_spark.ops.gif import decode_gif, encode_gif

        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
        )
        base = np.full((3, 3), 2, np.uint8)
        over = np.array([[1, 3, 1], [3, 1, 3], [1, 1, 1]], np.uint8)
        frames = decode_gif(encode_gif([base, over], pal, transparent=1))
        want = pal[np.where(over == 1, base, over)]
        assert (frames[1][0][:, :, :3] == want).all()

    def test_disposal_restore_background_then_repaint(self):
        import numpy as np

        from rsoup_spark.ops.gif import decode_gif, encode_gif

        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
        )
        base = np.full((3, 3), 2, np.uint8)
        over = np.array([[1, 3, 1], [3, 1, 3], [1, 1, 1]], np.uint8)
        frames = decode_gif(
            encode_gif([base, over, base], pal, transparent=1,
                       disposals=[0, 2, 0])
        )
        assert (frames[2][0][:, :, :3] == pal[base]).all()
        assert (frames[2][0][:, :, 3] == 255).all()

    def test_256_color_grayscale_and_interlace(self):
        import numpy as np

        from rsoup_spark.ops.gif import (
            _INTERLACE_PASSES,
            decode_gif_first,
            encode_gif,
        )

        gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        idx = np.random.default_rng(4).integers(
            0, 256, size=(33, 41), dtype=np.uint8
        )
        f = decode_gif_first(encode_gif([idx], gray))
        assert (f[:, :, 0] == idx).all() and (f[:, :, 2] == idx).all()

        # hand-build an interlaced frame: rows permuted into pass order
        blob = bytearray(encode_gif([idx], gray))
        # rebuild via encoder internals instead: permute rows, set the
        # interlace flag, and expect the original image back
        from rsoup_spark.ops.gif import _lzw_encode_literal
        import struct

        h, w = idx.shape
        order = [
            y for start, step in _INTERLACE_PASSES
            for y in range(start, h, step)
        ]
        permuted = idx[order]
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)
        out += gray.tobytes()
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
        out += bytes([8])
        lzw = _lzw_encode_literal(8, permuted)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00\x3b"
        got = decode_gif_first(bytes(out))
        assert (got[:, :, 0] == idx).all()

    def test_malformed_named(self):
        import pytest as pt

        from rsoup_spark.ops.gif import decode_gif

        with pt.raises(ValueError, match="magic"):
            decode_gif(b"PNGnotagif")
        with pt.raises(ValueError, match="no image data"):
            decode_gif(b"GIF89a" + b"\x02\x00\x02\x00\x00\x00\x00\x3b")

    @pytest.mark.spark
    def test_gif_frame_stats_dataflow(self, spark):
        """Real animated GIFs flow binary-column -> Arrow batch ->
        LZW decode -> per-frame stats; undecodable blobs dropped."""
        import numpy as np

        from rsoup_spark.ops.gif import encode_gif
        from rsoup_spark.ops.multimodal import gif_frame_stats

        gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        anim = encode_gif(
            [np.full((4, 6), v, np.uint8) for v in (10, 20, 30)],
            gray, delays_ms=[50, 70, 90],
        )
        rows = [
            ("anim", bytearray(anim)),
            ("junk", bytearray(b"NOTAGIF")),
        ]
        media = spark.createDataFrame(
            rows, "media_id string, data binary"
        )
        got = sorted(
            (r["frame_idx"], r["t_ms"], r["mean_rgb_ppm"])
            for r in gif_frame_stats(media).collect()
        )
        want = [
            (k, t, v * 1_000_000 // 255)
            for k, t, v in ((0, 0, 10), (1, 50, 20), (2, 120, 30))
        ]
        assert got == want


class TestJpegCodec:
    """Pure-Python baseline JPEG codec (ops/jpeg.py): exactness where
    the math allows it, bounded quantization error elsewhere, and the
    decoder's MCU / 4:2:0 upsampling / restart paths."""

    def test_constant_blocks_gray_q100_exact(self):
        import numpy as np

        from rsoup_spark.ops.jpeg import decode_jpeg, encode_jpeg

        img = np.zeros((16, 24), np.uint8)
        for by in range(2):
            for bx in range(3):
                img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                    10 + by * 50 + bx * 30
                )
        got = decode_jpeg(encode_jpeg(img, quality=100))
        # q100 quant steps are all 1 and AC of a constant block is 0:
        # the roundtrip is bit-exact, no tolerance
        assert got.shape == img.shape and (got == img).all()

    def test_gradient_and_noise_error_bounds(self):
        import numpy as np

        from rsoup_spark.ops.jpeg import decode_jpeg, encode_jpeg

        x = np.linspace(0, 255, 64)
        smooth = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(smooth, quality=95))
        assert np.abs(got.astype(int) - smooth.astype(int)).max() <= 4

        rng = np.random.default_rng(1)
        noise = rng.integers(0, 256, (24, 40, 3), np.uint8)
        got = decode_jpeg(encode_jpeg(noise, quality=90))
        assert np.abs(got.astype(int) - noise.astype(int)).mean() < 20

    def test_rgb_constant_blocks_q100(self):
        import numpy as np

        from rsoup_spark.ops.jpeg import decode_jpeg, encode_jpeg

        img = np.zeros((16, 16, 3), np.uint8)
        img[:8, :8] = [200, 30, 60]
        img[:8, 8:] = [10, 250, 90]
        img[8:, :8] = [5, 5, 128]
        img[8:, 8:] = [128, 128, 128]
        got = decode_jpeg(encode_jpeg(img, quality=100))
        # only YCbCr<->RGB float roundoff remains
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 2

    def test_non_multiple_of_8_dims(self):
        import numpy as np

        from rsoup_spark.ops.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (13, 11), np.uint8)
        got = decode_jpeg(encode_jpeg(img, quality=100))
        assert got.shape == (13, 11)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 1

    def test_420_subsampling_and_odd_dims(self):
        import numpy as np

        from rsoup_spark.ops.jpeg import decode_jpeg, encode_jpeg

        x = np.linspace(0, 255, 48)
        base = np.add.outer(x, np.linspace(0, 255, 56)) / 2
        img = np.stack(
            [base, base[::-1], np.full_like(base, 77)], -1
        ).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
        assert got.shape == img.shape
        assert np.abs(got.astype(int) - img.astype(int)).mean() < 6
        crop = img[:41, :37]
        got2 = decode_jpeg(encode_jpeg(crop, quality=92, subsample=True))
        assert got2.shape == crop.shape

    def test_restart_markers_do_not_change_pixels(self):
        import numpy as np

        from rsoup_spark.ops.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (40, 64, 3), np.uint8)
        a = decode_jpeg(encode_jpeg(img, quality=90))
        b = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=3))
        assert (a == b).all()

    def test_unsupported_and_malformed_named(self):
        import numpy as np
        import pytest as pt

        from rsoup_spark.ops.jpeg import decode_jpeg, encode_jpeg

        with pt.raises(ValueError, match="SOI"):
            decode_jpeg(b"nope")
        with pt.raises(ValueError, match="malformed|SOS"):
            decode_jpeg(b"\xff\xd8\xff\xe0 jpeg-ish")
        blob = bytearray(
            encode_jpeg(np.zeros((8, 8), np.uint8), quality=90)
        )
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC9  # arithmetic-coded frame: still env-gated
        with pt.raises(NotImplementedError, match="SOF9"):
            decode_jpeg(bytes(blob))
        # flipping SOF0->SOF2 makes the baseline scan header illegal
        # for a progressive frame (Ss=0 with Se=63): malformed, named
        blob[i + 1] = 0xC2
        with pt.raises(ValueError, match="progressive scan header"):
            decode_jpeg(bytes(blob))

    def test_progressive_constant_q100_exact(self):
        import numpy as np

        from rsoup_spark.ops.jpeg import (decode_jpeg,
                                          encode_jpeg_progressive)

        for img in (np.full((8, 8), 137, np.uint8),
                    np.full((16, 16, 3), 201, np.uint8)):
            for succ in (False, True):
                out = decode_jpeg(
                    encode_jpeg_progressive(img, 100, successive=succ)
                )
                assert (out == img).all()

    def test_progressive_equals_baseline(self):
        """Both encoders quantize identically, so the progressive
        multi-scan decode (spectral selection; with successive=True
        also DC/AC refinement bits and EOB-run corrections) must
        reproduce the baseline decode pixel-for-pixel."""
        import numpy as np

        from rsoup_spark.ops.jpeg import (decode_jpeg, encode_jpeg,
                                          encode_jpeg_progressive)

        rng = np.random.default_rng(7)
        images = [
            rng.integers(0, 256, (16, 24)).astype(np.uint8),
            rng.integers(0, 256, (13, 19, 3)).astype(np.uint8),
        ]
        sparse = np.zeros((32, 32), np.uint8)
        sparse[::8, ::8] = 255
        sparse[7::8, 5::8] = 90  # forces long zero runs / EOB runs
        images.append(sparse)
        y, x = np.mgrid[0:40, 0:40]
        images.append(((y * 2 + x * 3) % 256).astype(np.uint8))
        for img in images:
            for q in (50, 90, 100):
                base = decode_jpeg(encode_jpeg(img, q))
                for succ in (False, True):
                    prog = decode_jpeg(
                        encode_jpeg_progressive(img, q, successive=succ)
                    )
                    assert (prog == base).all(), (img.shape, q, succ)

    @pytest.mark.spark
    def test_jpeg_in_pixel_stats_dataflow(self, spark):
        """Real JPEG bytes through the Arrow-batched decode pass,
        beside a PNG and a junk blob."""
        import numpy as np

        from rsoup_spark.ops.jpeg import encode_jpeg
        from rsoup_spark.ops.multimodal import image_pixel_stats
        from rsoup_spark.ops.png import encode_png

        jimg = np.full((8, 8), 64, np.uint8)
        rows = [
            ("jpg", bytearray(encode_jpeg(jimg, quality=100))),
            ("png", bytearray(encode_png(jimg))),
            ("junk", bytearray(b"XXjunk")),
        ]
        media = spark.createDataFrame(
            rows, "media_id string, data binary"
        )
        got = {r["media_id"]: r.asDict()
               for r in image_pixel_stats(media).collect()}
        assert set(got) == {"jpg", "png"}
        want = 64 * 1_000_000 // 255
        assert got["jpg"]["mean_ppm"] == [want]
        assert got["png"]["mean_ppm"] == [want]


class TestWavCodec:
    """Pure-Python RIFF/PCM WAV codec (ops/wav.py) + audio_stats."""

    def test_roundtrip_16bit_mono_and_stereo(self):
        import numpy as np

        from rsoup_spark.ops.wav import decode_wav, encode_wav

        rng = np.random.default_rng(5)
        mono = rng.integers(-32768, 32768, 500, np.int32)
        s, rate, bits = decode_wav(encode_wav(mono, 44100))
        assert (rate, bits) == (44100, 16)
        assert s.shape == (500, 1) and (s[:, 0] == mono).all()

        stereo = rng.integers(-32768, 32768, (300, 2), np.int32)
        s, rate, bits = decode_wav(encode_wav(stereo, 16000))
        assert s.shape == (300, 2) and (s == stereo).all()

    def test_roundtrip_8bit_recentered(self):
        import numpy as np

        from rsoup_spark.ops.wav import decode_wav, encode_wav

        sig = np.array([-128, -1, 0, 1, 127], np.int32)
        s, rate, bits = decode_wav(encode_wav(sig, 8000, bits=8))
        assert bits == 8 and (s[:, 0] == sig).all()

    def test_24bit_and_float_decode(self):
        import struct

        import numpy as np

        from rsoup_spark.ops.wav import decode_wav

        # hand-build a 24-bit PCM WAV with known samples
        vals = [-(1 << 23), -1, 0, 1, (1 << 23) - 1]
        body = b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )
        fmt = struct.pack("<HHIIHH", 1, 1, 48000, 48000 * 3, 3, 24)
        wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 +
                                     len(body))
               + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(body)) + body)
        s, rate, bits = decode_wav(wav)
        assert bits == 24 and s[:, 0].tolist() == vals

        fl = np.array([-1.0, -0.5, 0.0, 0.5, 1.0], np.float32)
        fmt = struct.pack("<HHIIHH", 3, 1, 22050, 22050 * 4, 4, 32)
        body = fl.astype("<f4").tobytes()
        wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 +
                                     len(body))
               + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(body)) + body)
        s, rate, bits = decode_wav(wav)
        assert s.dtype == np.float64
        assert s[:, 0].tolist() == fl.astype(np.float64).tolist()

    def test_malformed_and_compressed_named(self):
        import struct

        import numpy as np
        import pytest as pt

        from rsoup_spark.ops.wav import decode_wav, encode_wav

        with pt.raises(ValueError, match="RIFF"):
            decode_wav(b"OggS not a wav")
        with pt.raises(ValueError, match="missing fmt"):
            decode_wav(b"RIFF\x04\x00\x00\x00WAVE")
        blob = bytearray(encode_wav(np.zeros(4, np.int32), 8000))
        i = blob.find(b"fmt ") + 8
        blob[i:i + 2] = struct.pack("<H", 85)  # MP3 format tag
        with pt.raises(NotImplementedError, match="format tag 85"):
            decode_wav(bytes(blob))

    @pytest.mark.spark
    def test_audio_stats_dataflow(self, spark):
        import numpy as np

        from rsoup_spark.ops.multimodal import audio_stats
        from rsoup_spark.ops.wav import encode_wav

        wave = np.empty(400, np.int32)
        wave[0::2] = 3000
        wave[1::2] = -3000
        rows = [
            ("sq", bytearray(encode_wav(wave, rate=8000))),
            ("junk", bytearray(b"NOTWAV")),
        ]
        media = spark.createDataFrame(
            rows, "media_id string, data binary"
        )
        got = {r["media_id"]: r.asDict()
               for r in audio_stats(media).collect()}
        assert set(got) == {"sq"}
        assert got["sq"]["sample_rate"] == 8000
        assert got["sq"]["duration_ms"] == 50
        assert got["sq"]["mean_abs_ppm"] == 3000 * 1_000_000 // 32767


class TestVideoCodec:
    """MJPEG-AVI + YUV4MPEG2 demux/decode (ops/video.py) and the
    executing frame sampler (video_frame_stats)."""

    def test_avi_mjpeg_roundtrip_gray_and_rgb(self):
        import numpy as np

        from rsoup_spark.ops.jpeg import encode_jpeg
        from rsoup_spark.ops.video import decode_video, mux_avi_mjpeg

        gray = [encode_jpeg(np.full((8, 8), v, np.uint8), quality=100)
                for v in (0, 17, 200, 255)]
        ms, frames = decode_video(mux_avi_mjpeg(gray, 8, 8, 100_000))
        assert ms == 100
        assert [int(f[0, 0]) for f in frames] == [0, 17, 200, 255]
        assert all(f.shape == (8, 8) for f in frames)

        rgb = [encode_jpeg(np.full((8, 8, 3), v, np.uint8), quality=100)
               for v in (10, 100)]
        ms, frames = decode_video(mux_avi_mjpeg(rgb, 8, 8, 40_000))
        assert ms == 40
        assert [f[0, 0].tolist() for f in frames] == [[10] * 3, [100] * 3]

    def test_avi_word_alignment_odd_payloads(self):
        """RIFF chunks pad odd sizes; a frame payload of odd length
        must not desync the parse."""
        import numpy as np

        from rsoup_spark.ops.jpeg import encode_jpeg
        from rsoup_spark.ops.video import demux_avi, mux_avi_mjpeg

        f = encode_jpeg(np.full((8, 8), 9, np.uint8), quality=100)
        # force an odd payload length; decoders ignore post-EOI bytes
        odd = f if len(f) % 2 == 1 else f + b"\xd9"
        assert len(odd) % 2 == 1
        f = f + b"\xd9\xd9" if f is odd else f
        us, payloads = demux_avi(mux_avi_mjpeg([odd, f, odd], 8, 8))
        assert us == 100_000
        assert [len(p) for p in payloads] == [len(odd), len(f), len(odd)]

    def test_avi_error_classes(self):
        import numpy as np
        import pytest

        from rsoup_spark.ops.jpeg import encode_jpeg
        from rsoup_spark.ops.video import decode_video, demux_avi, \
            mux_avi_mjpeg

        f = encode_jpeg(np.full((8, 8), 1, np.uint8), quality=100)
        good = mux_avi_mjpeg([f], 8, 8)
        with pytest.raises(ValueError):
            demux_avi(good[:40])  # truncated chunk
        with pytest.raises(ValueError):
            demux_avi(b"RIFF\x04\x00\x00\x00WAVE")  # not an AVI form
        h264 = bytearray(good)
        h264[good.index(b"vids") + 4:good.index(b"vids") + 8] = b"H264"
        with pytest.raises(NotImplementedError):
            demux_avi(bytes(h264))  # inter-frame codec named
        with pytest.raises(NotImplementedError):
            decode_video(b"\x00\x00\x00 ftypisom")  # mp4: env-gated

    def test_y4m_mono_444_420(self):
        import numpy as np

        from rsoup_spark.ops.video import (decode_video, demux_y4m,
                                           mux_y4m)

        mono = [np.full((4, 6), v, np.uint8) for v in (3, 250)]
        ms, frames = decode_video(mux_y4m(mono, 20, 1))
        assert ms == 50
        assert [int(f[0, 0]) for f in frames] == [3, 250]

        # hand-built 444 frame: gray 128 chroma = identity on Y
        head = b"YUV4MPEG2 W2 H2 F10:1 C444\n"
        y = bytes([0, 64, 128, 255])
        frame = b"FRAME\n" + y + b"\x80" * 4 + b"\x80" * 4
        ms, frames = decode_video(head + frame)
        assert ms == 100
        assert frames[0][:, :, 0].flatten().tolist() == [0, 64, 128, 255]
        assert frames[0].shape == (2, 2, 3)

        # 420jpeg (spec default when C is absent): one chroma sample
        head = b"YUV4MPEG2 W2 H2 F10:1\n"
        ms, frames = decode_video(head + b"FRAME\n" + y + b"\x80\x80")
        # green == Y at neutral chroma
        assert frames[0][:, :, 1].flatten().tolist() == [0, 64, 128, 255]

    def test_y4m_errors_named(self):
        import pytest

        from rsoup_spark.ops.video import demux_y4m

        with pytest.raises(ValueError):
            demux_y4m(b"YUV4MPEG2 W2 H2 F10:1\nFRAME\n\x00")  # short
        with pytest.raises(NotImplementedError):
            demux_y4m(b"YUV4MPEG2 W2 H2 F10:1 C411\nFRAME\n" + b"\0" * 3)

    def test_video_frame_stats_dataflow(self, spark):
        """Sampling grid semantics + frame reuse + quarantine drop."""
        import numpy as np

        from rsoup_spark.ops.jpeg import encode_jpeg
        from rsoup_spark.ops.multimodal import video_frame_stats
        from rsoup_spark.ops.video import mux_avi_mjpeg

        frames = [encode_jpeg(np.full((8, 8), v, np.uint8), quality=100)
                  for v in (50, 150, 250)]
        avi = mux_avi_mjpeg(frames, 8, 8, 100_000)  # 300 ms clip
        rows = [("clip", bytearray(avi)), ("junk", bytearray(b"zz"))]
        media = spark.createDataFrame(
            rows, "media_id string, data binary"
        )
        got = sorted(
            (r["sample_at_ms"], r["frame_idx"], r["mean_ppm"])
            for r in video_frame_stats(media, every_ms=80).collect()
        )
        # grid: 0,80,160,240 < 300 -> frames 0,0,1,2
        assert got == [
            (0, 0, 50 * 1_000_000 // 255),
            (80, 0, 50 * 1_000_000 // 255),
            (160, 1, 150 * 1_000_000 // 255),
            (240, 2, 250 * 1_000_000 // 255),
        ]

    def test_audio_features_known_values(self, spark):
        """Square wave: RMS exactly A, crossings and dominant bin from
        the half-period; trailing partial window dropped; float WAV
        path exercised."""
        import numpy as np

        from rsoup_spark.ops.multimodal import audio_features
        from rsoup_spark.ops.wav import encode_wav

        idx = np.arange(512 + 100)  # 100-sample tail must be dropped
        wave = np.where((idx // 16) % 2 == 0, 12000, -12000)
        rows = [("sq", bytearray(encode_wav(wave, rate=8000, bits=16)))]
        media = spark.createDataFrame(
            rows, "media_id string, data binary"
        )
        out = sorted(
            (r.asDict() for r in
             audio_features(media, window=256).collect()),
            key=lambda r: r["window_idx"],
        )
        assert [r["window_idx"] for r in out] == [0, 1]
        for r in out:
            assert r["rms_ppm"] == 12000 * 1_000_000 // 32767
            assert r["zero_crossings"] == 15
            assert r["dom_bin"] == 8


class TestWebpCodec:
    """VP8L (lossless WebP) codec: prefix codes, LZ77, color cache,
    all four transforms (ops/vp8l.py)."""

    @staticmethod
    def _rgba(img):
        import numpy as np

        if img.ndim == 2:
            return np.stack(
                [img] * 3 + [np.full(img.shape, 255, np.uint8)], -1)
        if img.shape[2] == 3:
            return np.concatenate(
                [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], -1)
        return img

    def test_literals_runs_cache_roundtrip(self):
        import numpy as np

        from rsoup_spark.ops.vp8l import decode_webp, encode_vp8l

        rng = np.random.default_rng(3)
        for img, kw in [
            (rng.integers(0, 256, (3, 5)).astype(np.uint8), {}),
            (rng.integers(0, 256, (16, 16, 3)).astype(np.uint8), {}),
            (rng.integers(0, 256, (7, 9, 4)).astype(np.uint8), {}),
            (np.full((64, 64), 9, np.uint8), {}),          # long runs
            (rng.integers(0, 4, (20, 20)).astype(np.uint8) * 80,
             {"cache_bits": 4}),                            # cache hits
            (rng.integers(0, 256, (12, 12, 3)).astype(np.uint8),
             {"cache_bits": 8}),
        ]:
            out = decode_webp(encode_vp8l(img, **kw))
            assert (out == self._rgba(img)).all(), kw

    def test_all_predictor_modes(self):
        import numpy as np

        from rsoup_spark.ops.vp8l import decode_webp, encode_vp8l

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (12, 17, 3)).astype(np.uint8)
        for mode in range(14):
            out = decode_webp(
                encode_vp8l(img, transform=f"predictor:{mode}"))
            assert (out == self._rgba(img)).all(), mode

    def test_color_transform_and_palettes(self):
        import numpy as np

        from rsoup_spark.ops.vp8l import decode_webp, encode_vp8l

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (12, 17, 3)).astype(np.uint8)
        for deltas in ("16,0,0", "0,16,0", "0,0,16", "250,37,129"):
            out = decode_webp(
                encode_vp8l(img, transform=f"color:{deltas}"))
            assert (out == self._rgba(img)).all(), deltas
        for ncol in (2, 4, 16, 200):  # packing widths 3, 2, 1, 0
            vals = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
            pal = vals[rng.integers(0, ncol, (13, 21))]
            out = decode_webp(encode_vp8l(pal, transform="palette"))
            assert (out == self._rgba(pal)).all(), ncol

    def test_subtract_green_and_gray(self):
        import numpy as np

        from rsoup_spark.ops.vp8l import decode_webp, encode_vp8l

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
        out = decode_webp(encode_vp8l(img, transform="subtract_green"))
        assert (out == self._rgba(img)).all()
        gray = rng.integers(0, 256, (8, 8)).astype(np.uint8)
        out = decode_webp(encode_vp8l(gray, transform="predictor:11"))
        assert (out == self._rgba(gray)).all()

    def test_errors_named(self):
        import pytest as pt

        from rsoup_spark.ops.vp8l import decode_webp

        with pt.raises(ValueError, match="RIFF"):
            decode_webp(b"not webp")
        # lossy VP8 chunk: environment-gated, named
        lossy = (b"RIFF\x14\x00\x00\x00WEBPVP8 \x04\x00\x00\x00"
                 b"\x00\x00\x00\x00")
        with pt.raises(NotImplementedError, match="VP8"):
            decode_webp(lossy)
        with pt.raises(ValueError, match="truncated|image chunk"):
            decode_webp(b"RIFF\x08\x00\x00\x00WEBPVP8L\xff\x00\x00\x00")

    def test_webp_in_decode_image_dispatch(self):
        import numpy as np

        from rsoup_spark.ops.multimodal import decode_image
        from rsoup_spark.ops.vp8l import encode_vp8l

        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        out = decode_image(encode_vp8l(img))
        assert out.shape == (8, 8, 4)
        assert (out[:, :, 0] == img).all()
