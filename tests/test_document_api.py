"""Document/CSS-select facade + serialization round-trips (O2, O19-O22)."""

import pickle
from pathlib import Path

import pytest

from rsoup_spark.functions.document import Document, css_select, render_html
from rsoup_spark.functions.dom import parse_document
from rsoup_spark.functions.table import TableExtractor, Table

RES = Path("/root/reference/tests/resources")


def test_select_by_class_and_nested():
    # mirrors Document.select usage in the reference tests
    doc = Document("https://x.test/", (RES / "extractors/text.html").read_text())
    els = doc.select("div.test\\:get-text" .replace("\\:", ":"))
    # our subset: class selector with ':' inside the name
    els = doc.select("div.test:get-text")
    assert len(els) == 4
    assert els[0].name == "div"
    assert els[0].get_text() == "What are youdoing ?"
    # nested select (elementrefview.rs:32-43)
    inner = doc.select("div#level\\ 1" if False else ".test:nested-select")
    level1 = inner[0].select("div")
    assert [e.id for e in level1][0] == "level 1"


def test_select_descendant_and_union():
    html = """<html><body>
      <div id="a"><p><b>x</b></p></div>
      <div id="b"><b>y</b></div>
      <span class="c">z</span>
    </body></html>"""
    root = parse_document(html)
    bs = css_select(root, "div b")
    assert len(bs) == 2
    u = css_select(root, "#a, span.c")
    assert [n.attrs.get("id", n.tag) for n in u] == ["a", "span"]
    # child combinator: only the direct-child <b> under #b matches
    direct = css_select(root, "div > b")
    assert [n.outer_text() for n in direct] == ["y"]
    with pytest.raises(ValueError):
        css_select(root, "div:hover")  # unsupported pseudo is explicit


def test_select_attribute_operators():
    html = """<html><body>
      <a href="https://x.test/a.pdf" rel="nofollow ugc">1</a>
      <a href="/local/page" lang="en-US">2</a>
      <a href="https://y.test/b.html">3</a>
      <a>4</a>
    </body></html>"""
    root = parse_document(html)

    def texts(sel):
        return [n.outer_text() for n in css_select(root, sel)]

    assert texts("a[href]") == ["1", "2", "3"]
    assert texts('a[href="/local/page"]') == ["2"]
    assert texts("a[href^=https]") == ["1", "3"]
    assert texts("a[href$='.pdf']") == ["1"]
    assert texts("a[href*=y.test]") == ["3"]
    assert texts("a[rel~=nofollow]") == ["1"]
    assert texts("a[lang|=en]") == ["2"]


def test_select_structural_pseudos():
    html = """<html><body><ul>
      <li>one</li><li>two</li><li>three</li><li>four</li><li>five</li>
    </ul></body></html>"""
    root = parse_document(html)

    def texts(sel):
        return [n.outer_text() for n in css_select(root, sel)]

    assert texts("li:first-child") == ["one"]
    assert texts("li:last-child") == ["five"]
    assert texts("li:nth-child(2)") == ["two"]
    assert texts("li:nth-child(odd)") == ["one", "three", "five"]
    assert texts("li:nth-child(2n)") == ["two", "four"]
    assert texts("li:nth-child(n+4)") == ["four", "five"]
    assert texts("li:nth-child(-n+2)") == ["one", "two"]
    assert texts("li:nth-last-child(1)") == ["five"]
    assert texts("li:not(:first-child)") == ["two", "three", "four", "five"]
    assert texts("ul :only-child") == []


def test_select_sibling_combinators():
    html = """<html><body>
      <h2>head</h2><p>first</p><p>second</p><div>x</div><p>third</p>
    </body></html>"""
    root = parse_document(html)

    def texts(sel):
        return [n.outer_text() for n in css_select(root, sel)]

    assert texts("h2 + p") == ["first"]
    assert texts("h2 ~ p") == ["first", "second", "third"]
    assert texts("div + p") == ["third"]


def test_select_scoped_like_scraper():
    """Nested select: candidates come from the scope subtree, but
    ancestor combinators evaluate against the FULL document (scraper's
    ElementRef::select matches the selector on the whole tree)."""
    doc = Document(
        "https://x.test/",
        '<html><body><div class="outer"><section>'
        '<p>in</p></section></div><p>out</p></body></html>',
    )
    section = doc.select("section")[0]
    # '.outer p': .outer is an ancestor of the scope -> the inner <p>
    # matches (scraper parity); the outside <p> never does (candidates
    # are subtree-restricted)
    assert [v.get_text() for v in section.select(".outer p")] == ["in"]
    assert [v.get_text() for v in section.select("p")] == ["in"]
    assert [v.get_text() for v in section.select("body p")] == ["in"]


def test_select_leading_combinator_raises():
    doc = Document("https://x.test/", "<html><body><p>x</p></body></html>")
    import pytest as _pytest

    for sel in ("> p", "div, > p", "+ p"):
        with _pytest.raises(ValueError):
            doc.select(sel)


def test_element_accessors_and_html_roundtrip():
    doc = Document(
        "https://x.test/",
        '<html><body><a id="k" class="m n" href="/p">text <b>bold</b></a>'
        "</body></html>",
    )
    a = doc.select("a")[0]
    assert a.name == "a" and a.id == "k"
    assert a.has_class("m") and a.has_class("n") and not a.has_class("z")
    assert a.attr("href") == "/p"
    assert a.inner_html() == "text <b>bold</b>"
    assert a.html() == '<a id="k" class="m n" href="/p">text <b>bold</b></a>'
    rt = a.get_rich_text()
    assert rt.text == "text bold"


def test_table_json_pickle_roundtrip():
    # serialization fidelity (tests/models/test_pickle.py:21-37 analogue)
    html = (RES / "table_span.html").read_text()
    tables = TableExtractor().extract("https://e.test/p", html)
    t = tables[0]
    t2 = Table.from_json(t.to_json())
    assert t2.to_dict() == t.to_dict()
    t3 = pickle.loads(pickle.dumps(t))
    assert t3.to_dict() == t.to_dict()
    # iterators (O21)
    assert sum(1 for _ in t.iter_cells()) == t.shape()[0] * t.shape()[1]
    ris = {ri for ri, _ci, _c in t.enumerate_cells()}
    assert ris == set(range(t.n_rows()))
    assert t.get_cell(0, 0).value.text == t.to_list()[0][0]


def test_render_html_escapes_text():
    root = parse_document("<p>a &lt; b &amp; c</p>")
    assert render_html(root.children[0]) == "<p>a &lt; b &amp; c</p>"
