"""Golden tests ported from the reference text-extraction suite.

Sources:
* /root/reference/tests/extractors/test_text_extractor.rs:12-114
* fixture: /root/reference/tests/resources/extractors/text.html
"""

from pathlib import Path

import pytest

from rsoup_spark.functions.dom import parse_document, parse_fragment
from rsoup_spark.functions.text import (
    HEADER_ELEMENTS,
    RichText,
    RichTextElement,
    get_rich_text,
    get_text,
)

RES = Path("/root/reference/tests/resources")


def load(name: str):
    return parse_document((RES / name).read_text())


def test_get_text_goldens():
    # test_text_extractor.rs:12-25
    doc = load("extractors/text.html")
    els = doc.find_by_class("test:get-text")
    assert len(els) == 4
    assert get_text(els[0]) == "What are youdoing ?"
    assert get_text(els[1]) == (
        "Date: Today\nTime: now\nHello world !\nWhat are youdoing ?\n...\n"
        "I'm sleeping\nThis is where the conversationend. or not?"
    )
    assert get_text(els[3]) == (
        "abc def\nContent of section 1\nSection 1.1\n"
        "Content of section 1.1\nhello World ."
    )


def test_get_rich_text_struct_golden():
    # test_text_extractor.rs:37-68: exact span tree
    node = parse_fragment("<p>What are you<b>doing </b>?</p>").children[0]
    rt = get_rich_text(node, frozenset(), False, frozenset(), HEADER_ELEMENTS)
    assert rt.text == "What are youdoing ?"
    assert rt.nodes[0] == RichTextElement("p", 0, 19, {})
    assert rt.nodes[1] == RichTextElement("b", 12, 17, {})
    assert rt.children == [[1], []]
    assert rt.root == 0


@pytest.mark.parametrize(
    "doc,want",
    [
        ("<p>What are you<b>doing </b>?</p>", "What are you<b>doing</b> ?"),
        ("<i></i>", "<i></i>"),
        ("  <i>   </i>", "<i></i>"),
        (
            "<a>  Link    to<b> something</b><i></i></a>",
            "<a>Link to <b>something</b><i></i></a>",
        ),
        (
            "<a>  Link    to<b> something</b><i></i> <span><b></b></span></a>",
            "<a>Link to <b>something</b><i></i><span><b></b></span></a>",
        ),
        ("<span>hello</span> <a>World</a> .", "<span>hello</span> <a>World</a> ."),
    ],
)
def test_get_rich_text_html_goldens(doc, want):
    # test_text_extractor.rs:70-97 (rendered via to_html(False, False))
    node = parse_fragment(doc)
    rt = get_rich_text(node, frozenset(), True, frozenset(), HEADER_ELEMENTS)
    assert rt.to_html(False, False) == want


def test_get_rich_text_multiline_golden():
    # test_text_extractor.rs:99-112
    doc = load("extractors/text.html")
    els = doc.find_by_class("test:get-text")
    rt = get_rich_text(els[3], frozenset(), True, frozenset(), HEADER_ELEMENTS)
    assert rt.text == (
        "abc def\nContent of section 1\nSection 1.1\n"
        "Content of section 1.1\nhello World ."
    )
    assert rt.to_html(False, False) == (
        "abc <span>def</span>\nContent of section 1\n<h2>Section 1.1</h2>\n"
        "Content of section 1.1\n<span>hello</span> <a>World</a> ."
    )


def test_richtext_dict_roundtrip():
    # serialization fidelity analogue of tests/models/test_pickle.py:21-37
    node = parse_fragment("<a href='/x'>  Link  to<b> it</b></a>")
    rt = get_rich_text(node, frozenset(), True, frozenset(), HEADER_ELEMENTS)
    assert RichText.from_dict(rt.to_dict()) == rt


def test_nbsp_is_whitespace():
    # html5ever + Rust char::is_whitespace treat U+00A0 as whitespace;
    # our Line must collapse it (exercised by the infobox golden)
    node = parse_fragment("<td>← <a href='/w'>2012</a></td>")
    rt = get_rich_text(node, frozenset(), True, frozenset(), HEADER_ELEMENTS)
    assert rt.text == "← 2012"


def test_get_text_v1_equals_v2_on_real_pages():
    """O4: the legacy v1 renderer agrees byte-for-byte with canonical
    v2 on well-formed content (the reference keeps both; v2 is a
    faster reformulation of the same four whitespace rules)."""
    from rsoup_spark.functions.dom import parse_document
    from rsoup_spark.functions.text import get_text, get_text_v1

    wiki = open(
        "/root/reference/tests/resources/wikipedia/"
        "List_of_highest_mountains_on_Earth.html"
    ).read()
    cases = [
        wiki,
        "<div>a<p> b  c </p>d</div>",
        "<span>x</span> <b>y</b>\n<p>z</p>",
        "<ul><li>one<li>two</ul>tail",
        "<table><tr><td>a</td><td>b</td></tr></table>",
    ]
    for html in cases:
        doc = parse_document(html)
        assert get_text_v1(doc) == get_text(doc), html[:60]


def test_get_text_v1_line_rules():
    """v1's own contract (get_text_v1.rs rules 1-4): block lines,
    empty lines skipped, whitespace collapsed, ends trimmed."""
    from rsoup_spark.functions.dom import parse_document
    from rsoup_spark.functions.text import get_text_v1

    doc = parse_document(
        "<div>  a   b </div><div>   </div><p>c</p>inline <b>d</b>"
    )
    assert get_text_v1(doc) == "a b\nc\ninline d"
