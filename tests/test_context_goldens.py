"""Golden tests ported from the reference context-extractor suite.

Source: /root/reference/tests/extractors/test_context_extractor.rs:8-146
Fixtures: extractors/context/{one-level,three-level}.html
"""

from pathlib import Path

from rsoup_spark.functions.context import ContextExtractor
from rsoup_spark.functions.dom import parse_document

RES = Path("/root/reference/tests/resources/extractors/context")


def render(rich):
    return rich.to_html(True, False)


def test_locate_content_before_one_level():
    # test_context_extractor.rs:8-52: tree shape
    doc = parse_document((RES / "one-level.html").read_text())
    marker = doc.find_by_id("marker")
    ex = ContextExtractor()
    before, after = ex.locate_content_before_and_after(marker)

    # root of tree_before is <body>; children: text, h1, text, div-path
    root_tags = [
        before.nodes[c].tag if before.nodes[c].is_element else "#text"
        for c in before.children[before.root]
    ]
    assert before.nodes[before.root].tag == "body"
    assert root_tags == ["#text", "h1", "#text", "div"]
    div_id = before.children[before.root][-1]
    div_tags = [
        before.nodes[c].tag if before.nodes[c].is_element else "#text"
        for c in before.children[div_id]
    ]
    assert div_tags == ["#text", "span", "#text", "p", "#text", "span",
                        "#text", "a", "#text"]


def test_flatten_node_golden():
    # test_context_extractor.rs:55-86
    doc = parse_document((RES / "three-level.html").read_text())
    sec = doc.find_by_id("section-1")
    ex = ContextExtractor()
    out = []
    ex.flatten_node(sec, out)
    assert [render(r) for r in out] == [
        "<>abc <span>def</span></>",
        "<>Content of section 1</>",
        "<h2>Section 1.1</h2>",
        "<>Content of section 1.1</>",
        "<><span>hello</span> <a>World</a> .</>",
    ]


def test_context_hierarchy_golden():
    # test_context_extractor.rs:89-146
    doc = parse_document((RES / "three-level.html").read_text())
    marker = doc.find_by_id("marker")
    ex = ContextExtractor()
    ctx = ex.extract_context(marker)

    got = [
        (
            c.level,
            render(c.heading),
            [render(x) for x in c.content_before],
            [render(x) for x in c.content_after],
        )
        for c in ctx
    ]
    assert got == [
        (0, "<></>", ["<>Date: Today</>"], []),
        (1, "<h1>Section 1</h1>",
         ["<>abc <span>def</span></>", "<>Content of section 1</>"], []),
        (2, "<h2>Section 1.1</h2>",
         ["<>Content of section 1.1</>",
          "<><span>hello</span> <a>World</a> .</>"], []),
        (3, "<h3>Section 1.1.1</h3>",
         ["<>here <span>is the section</span> <b>1.1.1</b></>"], []),
    ]


def test_increasing_chain_filter():
    # a lower-or-equal heading after a higher one must drop the earlier one
    html = """
    <html><body>
      <h2>Old section</h2>
      <p>old text</p>
      <h1>Top</h1>
      <h3>Sub</h3>
      <table id="t"><tbody><tr><td>x</td></tr></tbody></table>
      <p>after text</p>
      <h2>next section</h2>
    </body></html>
    """
    doc = parse_document(html)
    table = doc.find_all("table")[0]
    ctx = ContextExtractor().extract_context(table)
    assert [c.level for c in ctx] == [0, 1, 3]
    assert [render(c.heading) for c in ctx[1:]] == ["<h1>Top</h1>", "<h3>Sub</h3>"]
    # content_after attaches to the last level and stops at the next
    # same-content-level element (h2)
    assert [render(x) for x in ctx[-1].content_after] == ["<>after text</>"]


def test_fix_tree_reference_semantics():
    """O25 (reference rsoup/python/context_extractor.py:55-102):
    inline elements containing block elements split around them,
    keeping the reference's exact sequence -- including the empty
    leading inline clone when the block comes first."""
    from rsoup_spark.functions.context import fix_tree
    from rsoup_spark.functions.dom import parse_fragment

    def shapes(html):
        root = parse_fragment(html).children[0]
        return [(n.tag, n.outer_text()) for n in fix_tree(root)]

    assert shapes("<span>a<div>b</div>c</span>") == [
        ("span", "a"), ("div", "b"), ("span", "c")
    ]
    # block-first: the empty inline clone stays, as in the reference
    assert shapes("<b><div>x</div>y</b>") == [
        ("b", ""), ("div", "x"), ("b", "y")
    ]
    # nested inline splitting recurses
    assert shapes("<i>p<span>q<p>r</p>s</span>t</i>") == [
        ("i", "pq"), ("p", "r"), ("i", "st")
    ]
    # already-legal trees come back as a single clone
    assert shapes("<div>a<span>b</span></div>") == [("div", "ab")]
    assert shapes("<span>a<b>c</b></span>") == [("span", "ac")]
