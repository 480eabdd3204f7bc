"""WARC ingest (sources/warc.py): writer/parser units + the
distributed record reader."""

import pytest


class TestWarcCodec:
    def test_roundtrip_gzip_and_plain(self):
        from rsoup_spark.sources.warc import parse_warc, write_warc

        recs = [
            {"url": "http://a.test/", "payload": b"<html>hi</html>",
             "http_status": 200},
            {"warc_type": "warcinfo", "payload": b"software: x",
             "content_type": "application/warc-fields"},
            {"url": "http://b.test/x", "payload": b"\x00\xffbin",
             "http_status": 404,
             "http_headers": {"Content-Type": "image/png"}},
        ]
        for gz in (True, False):
            out = parse_warc(write_warc(recs, per_record_gzip=gz))
            assert [r["warc_type"] for r in out] == \
                ["response", "warcinfo", "response"]
            assert out[0]["url"] == "http://a.test/"
            assert out[0]["http_status"] == 200
            assert out[0]["mime"] == "text/html"
            assert out[0]["body"] == b"<html>hi</html>"
            assert out[1]["http_status"] is None
            assert out[2]["http_status"] == 404
            assert out[2]["mime"] == "image/png"
            assert out[2]["body"] == b"\x00\xffbin"

    def test_deterministic_fixture_bytes(self):
        from rsoup_spark.sources.warc import write_warc

        recs = [{"url": "http://a.test/", "payload": b"p"}]
        assert write_warc(recs) == write_warc(recs)

    def test_multi_member_gzip_split(self):
        """Common Crawl gzips each record as its own member; the reader
        must walk all members, not stop after the first."""
        from rsoup_spark.sources.warc import parse_warc, write_warc

        recs = [{"url": f"http://h.test/{i}", "payload": b"x" * i}
                for i in range(1, 6)]
        out = parse_warc(write_warc(recs, per_record_gzip=True))
        assert [len(r["body"]) for r in out] == [1, 2, 3, 4, 5]

    def test_malformed_named(self):
        from rsoup_spark.sources.warc import parse_warc, write_warc

        with pytest.raises(ValueError, match="gzip"):
            parse_warc(b"\x1f\x8bnope")
        with pytest.raises(ValueError, match="WARC version"):
            parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
        whole = write_warc(
            [{"url": "http://a.test/", "payload": b"q" * 50}],
            per_record_gzip=False,
        )
        with pytest.raises(ValueError, match="truncated"):
            parse_warc(whole[:-40])

    @pytest.mark.spark
    def test_warc_records_dataflow(self, spark):
        """Archive blobs -> record rows; malformed archives dropped
        (quarantine semantics), multi-record archives explode."""
        from pyspark.sql import functions as F

        from rsoup_spark.sources.warc import warc_records, write_warc

        two = write_warc([
            {"url": "http://a.test/1", "payload": b"one",
             "http_status": 200},
            {"url": "http://a.test/2", "payload": b"two22",
             "http_status": 301},
        ])
        rows = [
            ("arc0", bytearray(two)),
            ("junk", bytearray(b"not a warc")),
        ]
        archives = spark.createDataFrame(rows, "src string, data binary")
        got = sorted(
            (r["src"], r["record_idx"], r["url"], r["http_status"],
             r["n"])
            for r in warc_records(archives)
            .withColumn("n", F.length("body")).collect()
        )
        assert got == [
            ("arc0", 0, "http://a.test/1", 200, 3),
            ("arc0", 1, "http://a.test/2", 301, 5),
        ]


class TestCharset:
    def test_bom_overrides_everything(self):
        import codecs

        from rsoup_spark.sources.charset import decode_html

        body = codecs.BOM_UTF8 + '<meta charset="iso-8859-1">café'.encode()
        text, enc = decode_html(body, http_charset="utf-16-le")
        assert enc == "utf-8" and text.endswith("café")
        assert not text.startswith("﻿")  # BOM stripped

        b16 = codecs.BOM_UTF16_LE + "héllo".encode("utf-16-le")
        text, enc = decode_html(b16)
        assert (text, enc) == ("héllo", "utf-16-le")

    def test_http_beats_meta_and_labels_normalize(self):
        from rsoup_spark.sources.charset import decode_html, normalize_label

        body = '<meta charset="utf-8">café'.encode("cp1252")
        text, enc = decode_html(body, http_charset="Windows-1252")
        assert enc == "windows-1252" and text.endswith("café")
        # WHATWG: the latin-1 / iso-8859-1 labels mean cp1252
        assert normalize_label("ISO-8859-1") == "windows-1252"
        assert normalize_label("'utf8'") == "utf-8"
        assert normalize_label("no-such-charset") is None

    def test_meta_prescan_forms(self):
        from rsoup_spark.sources.charset import prescan_meta_charset

        assert prescan_meta_charset(b'<meta charset=utf-8>') == "utf-8"
        assert prescan_meta_charset(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=EUC-JP">') == "EUC-JP"
        # outside the 1024-byte prescan window: not found
        assert prescan_meta_charset(
            b" " * 1024 + b'<meta charset=utf-8>') is None
        assert prescan_meta_charset(b"<p>no meta</p>") is None

    def test_fallback_never_raises(self):
        from rsoup_spark.sources.charset import decode_html

        text, enc = decode_html(b"ok \xff\xfe\xff bytes")
        assert enc == "utf-8" and "�" in text and "ok" in text

    @pytest.mark.spark
    def test_decode_bodies_dataflow(self, spark):
        from rsoup_spark.sources.charset import decode_bodies
        from rsoup_spark.sources.warc import warc_records, write_warc

        arc = write_warc([
            {"url": "http://a.test/1", "payload": "café".encode("cp1252"),
             "http_headers": {"Content-Type":
                              "text/html; charset=windows-1252"}},
            {"url": "http://a.test/2", "payload": "naïve".encode()},
        ])
        files = spark.createDataFrame(
            [("a.warc.gz", bytearray(arc))], ["src", "data"])
        rows = {r["url"]: r for r in
                decode_bodies(warc_records(files)).collect()}
        assert rows["http://a.test/1"]["charset"] == "windows-1252"
        assert rows["http://a.test/1"]["encoding"] == "windows-1252"
        assert rows["http://a.test/1"]["text"] == "café"
        assert rows["http://a.test/2"]["encoding"] == "utf-8"
        assert rows["http://a.test/2"]["text"] == "naïve"
