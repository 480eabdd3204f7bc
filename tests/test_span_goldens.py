"""Span-sequence equality goldens (BASELINE.json input_hint: per-row
invariant vs the reference = (kind, text, media_ref, order)).

The golden docs follow FIXTURES.md F1 (g001..): HTML from the reference
fixtures, expected spans hand-derived from values the reference tests
assert (test_text_extractor.rs, test_table.rs, test_context_extractor.rs).
"""

from pathlib import Path

from rsoup_spark.operators.extract import spans_from_html

RES = Path("/root/reference/tests/resources")


def seq(html: str, url: str = "https://g.test/doc"):
    return [
        (s["kind"], s["text"], s["media_ref"])
        for s in spans_from_html(url, html)
    ]


def test_g001_bold_inside_paragraph():
    # test_text_extractor.rs:37-68: b-span covers "doing", trailing
    # space moved outside
    got = seq("<html><body><p>What are you<b>doing </b>?</p></body></html>")
    assert got == [
        ("text", "What are you", ""),
        ("b", "doing", ""),
        ("text", " ?", ""),
    ]


def test_g002_empty_inline():
    assert seq("<html><body><p><i></i></p></body></html>") == [("i", "", "")]


def test_g004_nested_inline_with_link():
    got = seq(
        '<html><body><p><a href="/x">  Link    to<b> something</b></a>'
        "</p></body></html>"
    )
    assert got == [("a", "Link to something", "/x"), ("b", "something", "")]


def test_g008_multiline_sections():
    # text.html 4th test div (test_text_extractor.rs:99-112)
    html = (RES / "extractors/text.html").read_text()
    spans = [
        (s["kind"], s["text"], s["media_ref"])
        for s in spans_from_html("https://g.test/8", html)
    ]
    # the h2 heading span from the section is present with exact text
    assert ("h2", "Section 1.1", "") in spans
    # heading order: h3 "Test:get-text" precedes h2 "Section 1.1"
    kinds = [k for k, _t, _m in spans]
    assert kinds.index("h3") < kinds.index("h2")


def test_g009_table_span_fixture_media():
    html = (RES / "table_span.html").read_text()
    spans = spans_from_html("https://g.test/9", html)
    anchors = [(s["text"], s["media_ref"]) for s in spans if s["kind"] == "a"]
    assert ("Mount Everest", "/wiki/Mount_Everest") in anchors
    assert ("Nepal", "/wiki/Nepal") in anchors
    # list items of the cslist are tracked spans (keep_tags ol/ul/li)
    li_texts = [s["text"] for s in spans if s["kind"] == "li"]
    assert "Sagarmatha" in li_texts and "Chomolungma" in li_texts


def test_g011_three_level_context_ordering():
    html = (RES / "extractors/context/three-level.html").read_text()
    spans = spans_from_html("https://g.test/11", html)
    heads = [(s["kind"], s["text"]) for s in spans
             if s["kind"] in ("h1", "h2", "h3")]
    assert heads == [
        ("h1", "Section 1"),
        ("h2", "Section 1.1"),
        ("h3", "Section 1.1.1"),
    ]
    # offsets strictly increase through the document for sibling spans
    offs = [s["offset"] for s in spans]
    assert offs == sorted(offs)


def test_media_interleaving_with_img():
    got = seq(
        "<html><body><p>before <img src='/i.png'/> after</p>"
        "</body></html>"
    )
    assert got == [
        ("text", "before", ""),
        ("img", "", "/i.png"),
        ("text", " after", ""),
    ]


def test_g012_multibyte_offsets_are_codepoints_not_bytes():
    """Documented divergence (SURVEY.md §1.2): reference spans carry Rust
    BYTE offsets (src/models/rich_text.rs); this engine standardizes on
    Python CODEPOINT offsets.  On a page with multibyte characters the
    conventions diverge -- pinned here explicitly so cross-validation
    against reference-emitted spans on such pages surprises no one
    (the reference's own ﻿ case, test_table_extractor.py:91)."""
    html = "<html><body><p>﻿café 中<b>x</b></p></body></html>"
    spans = spans_from_html("https://g.test/m", html)
    text, b = spans[0], spans[1]
    assert (text["kind"], text["text"]) == ("text", "﻿café 中")
    # codepoint offset of the <b> span = 7 codepoints of preceding text
    n_codepoints = len(text["text"])
    n_bytes = len(text["text"].encode("utf-8"))
    assert b["offset"] == text["offset"] + n_codepoints
    assert n_bytes != n_codepoints  # 12 bytes vs 7 codepoints here
    assert b["offset"] != text["offset"] + n_bytes
