"""Golden tests ported from the reference table suite.

Sources:
* /root/reference/tests/models/test_table.rs:20-76 (span grid)
* /root/reference/tests/extractors/test_table_extractor.rs:27-48
* fixtures: table_span.html, extractors/table.html
"""

from pathlib import Path

import pytest

from rsoup_spark.functions.dom import parse_document
from rsoup_spark.functions.table import (
    Cell,
    InvalidCellSpanError,
    OverlapSpanError,
    Row,
    Table,
    TableExtractor,
    URLConverter,
)
from rsoup_spark.functions.text import RichText

RES = Path("/root/reference/tests/resources")

SPAN_GOLDEN = [
    ["Mountain name(s)", "Height (rounded)", "Height (rounded)", "Range",
     "Ascents before 2004", "Ascents before 2004", "Ascents before 2004",
     "Country"],
    ["Mountain name(s)", "Height (rounded)", "Height (rounded)", "Range",
     "1st", "successful", "successful", "Country"],
    ["Mountain name(s)", "m", "ft", "Range", "1st", "y", "n", "Country"],
    ["Mount Everest\nSagarmatha\nChomolungma", "8,848", "29,029",
     "Mahalangur Himalaya", "1953", "145", "121", "Nepal\nChina"],
]


def extractor():
    # reference tests use html_error_forgiveness=False (test_table.rs:13)
    return TableExtractor(html_error_forgiveness=False)


def test_span_golden_grid():
    html = (RES / "table_span.html").read_text()
    tables = extractor().extract_tables(
        "http://example.com/page", parse_document(html),
        auto_span=False, auto_pad=False, extract_context=False,
    )
    assert len(tables) == 1
    assert tables[0].span().to_list() == SPAN_GOLDEN


def test_wikipedia_stray_table_text_fostered():
    """A real Wikipedia page with stray text injected directly inside
    <table> and <tr> (the most common real-crawl malformation) must
    extract the identical grid: foster parenting relocates the strays
    out of the table instead of polluting cells -- the html5ever
    behavior the reference inherits
    (/root/reference/src/extractors/mod.rs:20-25)."""
    html = (
        RES / "wikipedia/List_of_highest_mountains_on_Earth.html"
    ).read_text()
    url = "https://en.wikipedia.org/wiki/List_of_highest_mountains_on_Earth"
    clean = TableExtractor().extract(url, html)
    dirty_html = html.replace(
        "<tbody>", "<tbody>STRAY TABLE TEXT", 1
    ).replace("<tr>", "<tr>more strays", 1)
    assert dirty_html != html
    dirty = TableExtractor().extract(url, dirty_html)
    assert [t.shape() for t in dirty] == [t.shape() for t in clean]
    assert dirty[2].to_list() == clean[2].to_list()


def test_nova_scotia_page_golden():
    # test_table_extractor.rs:41-47: real page with nested/empty tables
    html = (
        RES / "wikipedia/2016_Nova_Scotia_municipal_elections.html"
    ).read_text()
    tables = extractor().extract_tables(
        "https://en.wikipedia.org/wiki/2016_Nova_Scotia_municipal_elections",
        parse_document(html),
        auto_span=False, auto_pad=False, extract_context=False,
    )
    assert tables[1].to_list()[0] == ["Mayoral candidate[1]", "Vote", "%"]


def test_nested_and_empty_tables_skipped():
    html = (RES / "extractors/table.html").read_text()
    el = parse_document(html).find_by_id("infobox-with-nested-opt-empty-tables")
    tables = extractor().extract_tables(
        "http://example.com/page", el,
        auto_span=False, auto_pad=False, extract_context=False,
    )
    # outer infobox contains nested tables -> skipped; empty inner table
    # (zero rows) -> skipped; only the 3-cell inner table survives
    assert len(tables) == 1
    assert tables[0].to_list() == [["← 2012", "October 15, 2016", "2020 →"]]


def _cell(text, rowspan=1, colspan=1, header=False):
    return Cell(is_header=header, rowspan=rowspan, colspan=colspan,
                value=RichText.from_str(text))


def test_span_overlap_raises():
    # colspan running into a rowspan-claimed slot -> OverlapSpanError
    t = Table(rows=[
        Row([_cell("a"), _cell("b", rowspan=2)]),
        Row([_cell("c", colspan=2), _cell("d")]),
    ])
    with pytest.raises(OverlapSpanError):
        t.span()


def test_span_overflow_not_last_cell_raises():
    t = Table(rows=[
        Row([_cell("a", colspan=5), _cell("b")]),
        Row([_cell("c"), _cell("d")]),
    ])
    with pytest.raises(InvalidCellSpanError):
        t.span()


def test_span_overflow_last_cell_truncates():
    t = Table(rows=[
        Row([_cell("a"), _cell("b", colspan=9)]),
        Row([_cell("c"), _cell("d")]),
    ])
    assert t.span().to_list() == [["a", "b"], ["c", "d"]]


def test_pad_inherits_header_and_identity():
    t = Table(rows=[
        Row([_cell("h1", header=True), _cell("h2", header=True)]),
        Row([_cell("a")]),
    ])
    padded = t.pad()
    assert padded is not None
    assert padded.to_list() == [["h1", "h2"], ["a", ""]]
    assert padded.rows[1].cells[1].is_header is False
    # regular table -> None (table.rs:198-201)
    assert padded.pad() is None


def test_forgiving_span_parse():
    ex = TableExtractor(html_error_forgiveness=True)
    doc = parse_document(
        "<html><body><table><tbody>"
        '<tr><td colspan="2abc">x</td><td colspan="">y</td>'
        '<td colspan="notanum">z</td></tr>'
        "</tbody></table></body></html>"
    )
    tables = ex.extract_tables("http://e.com/", doc, False, False, False)
    spans = [c.colspan for c in tables[0].rows[0].cells]
    assert spans == [2, 1, 1]


def test_table_id_assignment():
    html = (
        "<html><body>"
        "<table><tbody><tr><td>a</td></tr></tbody></table>"
        "<table><tbody><tr><td>b</td></tr></tbody></table>"
        "</body></html>"
    )
    tables = extractor().extract_tables(
        "https://example.com/page?x=1", parse_document(html),
        auto_span=True, auto_pad=True, extract_context=False,
    )
    assert [t.id for t in tables] == [
        "https://example.com/page?x=1&table_no=0",
        "https://example.com/page?x=1&table_no=1",
    ]
    assert all(t.url == "https://example.com/page?x=1" for t in tables)


def test_href_absolutization():
    # url_converter.rs:23-37 semantics incl. bare-relative left unchanged
    conv = URLConverter("https://en.wikipedia.org/wiki/Page?q=1")
    assert conv.to_absolute("//cdn.site.org/x") == "https://cdn.site.org/x"
    assert conv.to_absolute("/wiki/Other") == "https://en.wikipedia.org/wiki/Other"
    assert conv.to_absolute("./sub") == "https://en.wikipedia.org/wiki/sub"
    assert conv.to_absolute("bare/relative") == "bare/relative"
    assert conv.to_absolute("https://a.b/c") == "https://a.b/c"
    # reference-exact: host_str() drops port and credentials
    # (url_converter.rs), so host-relative hrefs lose the doc's port
    conv = URLConverter("https://user:pw@host.test:8080/x/y")
    assert conv.to_absolute("/a") == "https://host.test/a"


def test_cell_hrefs_absolutized_in_extract():
    html = (
        "<html><body><table><tbody>"
        '<tr><td><a href="/wiki/Nepal">Nepal</a></td></tr>'
        "</tbody></table></body></html>"
    )
    tables = extractor().extract_tables(
        "https://en.wikipedia.org/wiki/List", parse_document(html),
        True, True, True,
    )
    cell = tables[0].rows[0].cells[0]
    anchors = [n for n in cell.value.nodes if n.tag == "a"]
    assert anchors[0].attrs["href"] == "https://en.wikipedia.org/wiki/Nepal"


def test_wikipedia_selflink_postprocess():
    # legacy O24 (rsoup/python/table_extractor.py:295-306), opt-in
    html = (
        "<html><body><table><tbody><tr><td>"
        '<a class="mw-selflink selflink">This page</a>'
        "</td></tr></tbody></table></body></html>"
    )
    url = "https://en.wikipedia.org/wiki/Self"
    on = TableExtractor(wikipedia_selflink_postprocess=True).extract(url, html)
    anchor = [n for n in on[0].rows[0].cells[0].value.nodes if n.tag == "a"][0]
    assert anchor.attrs["href"] == url
    off = TableExtractor().extract(url, html)
    anchor = [n for n in off[0].rows[0].cells[0].value.nodes if n.tag == "a"][0]
    assert "href" not in anchor.attrs


def test_table_dict_roundtrip_shapes():
    html = (RES / "table_span.html").read_text()
    tables = extractor().extract_tables(
        "http://example.com/page", parse_document(html), True, True, True,
    )
    d = tables[0].to_dict()
    assert d["rows"][0]["cells"][0]["value"]["text"] == "Mountain name(s)"
    assert tables[0].shape() == (4, 8)
