"""Quarantine hardening: malformed crawled bytes must be DROPPED, not
job-fatal.

Web-scale inputs break in arbitrary ways (flipped bytes inside deflate
streams, truncated chunks, hostile DTDs).  Every source/codec promises
"malformed input is quarantine-dropped, never fatal" -- these tests pin
the exception-normalization boundary that keeps that promise: the raw
failure types (zlib.error, struct.error, IndexError, EOFError) must
surface as ValueError so the mapInPandas operators' quarantine catch
sees them."""

import gzip

import numpy as np
import pytest


def _flip(data: bytes, i: int) -> bytes:
    bad = bytearray(data)
    bad[i] ^= 0xFF
    return bytes(bad)


class TestArchiveGzipQuarantine:
    def test_corrupt_deflate_warc_raises_valueerror(self):
        """zlib.error from a corrupt deflate stream is neither OSError
        nor EOFError; parse_warc must still normalize it."""
        from rsoup_spark.sources.warc import parse_warc, write_warc

        good = write_warc(
            [{"url": "http://a.test/", "payload": b"x" * 200}],
            per_record_gzip=True,
        )
        # flip every byte after the 10-byte member header: whatever
        # layer each position breaks (deflate, CRC, length), the error
        # class callers see must be ValueError
        for i in range(10, len(good)):
            with pytest.raises(ValueError):
                parse_warc(_flip(good, i))

    def test_corrupt_deflate_sitemap_raises_valueerror(self):
        from rsoup_spark.sources.sitemap import parse_sitemap, write_sitemap

        good = write_sitemap(
            [{"loc": f"http://s.test/{i}"} for i in range(20)],
            gzipped=True,
        )
        for i in range(10, len(good)):
            with pytest.raises(ValueError):
                parse_sitemap(_flip(good, i))

    @pytest.mark.spark
    def test_corrupt_archive_dropped_in_dataflow(self, spark):
        from rsoup_spark.sources.warc import warc_records, write_warc

        good = write_warc(
            [{"url": "http://a.test/1", "payload": b"ok"}],
            per_record_gzip=True,
        )
        rows = [("good", bytearray(good)),
                ("bad", bytearray(_flip(good, 20)))]
        archives = spark.createDataFrame(rows, "src string, data binary")
        got = warc_records(archives).select("src").collect()
        assert [r["src"] for r in got] == ["good"]


class TestSitemapDtdRejection:
    def test_entity_bomb_rejected_before_parse(self):
        """ElementTree expands internal entities (billion laughs); a
        sitemap carrying any DTD is rejected as ValueError so hostile
        XML cannot OOM an executor."""
        from rsoup_spark.sources.sitemap import parse_sitemap

        bomb = (
            b'<?xml version="1.0"?>\n'
            b"<!DOCTYPE urlset [\n"
            b' <!ENTITY a "AAAAAAAAAA">\n'
            b' <!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;&a;&a;">\n'
            b"]>\n"
            b"<urlset><url><loc>http://x.test/&b;</loc></url></urlset>"
        )
        with pytest.raises(ValueError, match="DTD"):
            parse_sitemap(bomb)

    def test_gzipped_bomb_also_rejected(self):
        from rsoup_spark.sources.sitemap import parse_sitemap

        bomb = gzip.compress(
            b'<!DOCTYPE urlset [<!ENTITY a "x">]>'
            b"<urlset><url><loc>http://x.test/&a;</loc></url></urlset>"
        )
        with pytest.raises(ValueError, match="DTD"):
            parse_sitemap(bomb)


class TestCodecErrorNormalization:
    """Truncated/corrupt blobs raise ValueError from every public
    decode boundary -- the single class the operators quarantine on."""

    def test_png_truncated_idat_and_short_chunks(self):
        from rsoup_spark.ops.png import decode_png, encode_png

        img = np.arange(300, dtype=np.uint8).reshape(10, 10, 3) % 256
        good = encode_png(img)
        # cut inside IDAT: zlib.error path
        with pytest.raises(ValueError):
            decode_png(good[:40] + b"\x00" * 4)
        # flip bytes across the file: any failure must be ValueError
        # (or decode fine when the flip lands in an ignored field)
        for i in range(8, len(good)):
            try:
                decode_png(_flip(good, i))
            except ValueError:
                pass

    def test_gif_cut_mid_subblock(self):
        from rsoup_spark.ops.gif import decode_gif, encode_gif

        pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        frame = np.zeros((4, 4), dtype=np.uint8)
        good = encode_gif([frame], pal)
        for cut in range(14, len(good)):
            try:
                decode_gif(good[:cut])
            except ValueError:
                pass

    def test_wav_short_fmt_chunk(self):
        from rsoup_spark.ops.wav import decode_wav, encode_wav

        good = encode_wav(np.zeros((16, 1), dtype=np.int16), 8000)
        for cut in range(4, len(good)):
            try:
                decode_wav(good[:cut])
            except (ValueError, NotImplementedError):
                pass

    def test_webp_truncated(self):
        from rsoup_spark.ops.vp8l import decode_webp, encode_vp8l

        img = np.zeros((4, 4, 4), dtype=np.uint8)
        img[:, :, 3] = 255
        payload = encode_vp8l(img)
        good = (
            b"RIFF" + (len(payload) + 12).to_bytes(4, "little")
            + b"WEBPVP8L" + len(payload).to_bytes(4, "little") + payload
        )
        for cut in range(12, len(good)):
            try:
                decode_webp(good[:cut])
            except (ValueError, NotImplementedError):
                pass

    def test_video_truncated(self):
        from rsoup_spark.ops.video import decode_video

        y4m = (
            b"YUV4MPEG2 W4 H4 F25:1 C444\n"
            b"FRAME\n" + bytes(48)
        )
        decode_video(y4m)  # sanity: the good form decodes
        for cut in range(6, len(y4m)):
            try:
                decode_video(y4m[:cut])
            except (ValueError, NotImplementedError):
                pass


class TestOperatorQuarantine:
    @pytest.mark.spark
    def test_pixel_stats_drops_truncated_png(self, spark):
        from rsoup_spark.ops.multimodal import image_pixel_stats
        from rsoup_spark.ops.png import encode_png

        img = np.full((6, 6, 3), 128, dtype=np.uint8)
        good = encode_png(img)
        rows = [("good", bytearray(good)),
                ("trunc", bytearray(good[:40] + b"\x00\x00\x00\x00")),
                ("flip", bytearray(_flip(good, len(good) // 2)))]
        media = spark.createDataFrame(rows, "media_id string, data binary")
        got = {r["media_id"] for r in image_pixel_stats(media).collect()}
        # the flipped byte may land in an ignored field (chunk CRC) and
        # still decode -- the contract is only "never fatal, truncated
        # dropped, good kept"
        assert "good" in got and "trunc" not in got

    @pytest.mark.spark
    def test_box_resize_drops_non_integer_factor(self, spark):
        """A 100x90 image in a 64x64 box-resize corpus must be skipped,
        not fail the job."""
        from rsoup_spark.ops.multimodal import resize_image
        from rsoup_spark.ops.png import encode_png

        even = encode_png(np.full((8, 8, 3), 10, dtype=np.uint8))
        odd = encode_png(np.full((10, 9, 3), 10, dtype=np.uint8))
        media = spark.createDataFrame(
            [("even", bytearray(even)), ("odd", bytearray(odd))],
            "media_id string, data binary",
        )
        got = resize_image(media, 4, 4, method="box").collect()
        assert [r["media_id"] for r in got] == ["even"]
        assert got[0]["width"] == 4 and got[0]["height"] == 4
