"""Malformed-HTML recovery: the implied-end-tag subset of html5ever's
error handling (reference parses with html5ever,
/root/reference/src/extractors/mod.rs:20-25) that crawled pages hit
constantly -- unclosed <p>, list items, table cells/rows -- plus the
unquoted-attribute self-closing pitfall.

Every case asserts (a) the recovered shape and (b) fast-parser ==
stdlib-parser equivalence, which is the repo's parser contract.
Covered html5ever behaviors: implied end tags, foster parenting of
text/elements illegal inside table contexts, and the simple-case
adoption agency (misnested formatting elements), implicit
<tbody>/<tr>/<colgroup> synthesis (`<table><tr>` selects as
`table > tbody > tr`), and the cross-block adoption agency (the
spec's own worked example `<b>1<p>2</b>3</p>` and its
intermediate-formatting variant), with formatting end tags scoped at
cell/table/caption boundaries per html5 "has an element in scope".
"""

import pytest

from rsoup_spark.functions.dom import parse_document, parse_document_stdlib


def shape(node):
    out = []
    for c in node.children:
        if c.is_text:
            out.append(("#t", c.text))
        else:
            out.append((c.tag, sorted(c.attrs.items()), shape(c)))
    return out


CASES = {
    # ADVICE: '/' ending an unquoted attribute value is NOT self-closing
    "unquoted_href_slash": (
        "<a href=http://x.com/>text</a>",
        [("a", [("href", "http://x.com/")], [("#t", "text")])],
    ),
    "p_without_close": (
        "<p>one<p>two<p>three",
        [
            ("p", [], [("#t", "one")]),
            ("p", [], [("#t", "two")]),
            ("p", [], [("#t", "three")]),
        ],
    ),
    "li_without_close_nested_scope": (
        "<ul><li>a<li>b<ul><li>inner</ul><li>c</ul>",
        [
            (
                "ul",
                [],
                [
                    ("li", [], [("#t", "a")]),
                    (
                        "li",
                        [],
                        [
                            ("#t", "b"),
                            ("ul", [], [("li", [], [("#t", "inner")])]),
                        ],
                    ),
                    ("li", [], [("#t", "c")]),
                ],
            )
        ],
    ),
    "table_unclosed_cells_rows": (
        "<table><tr><td>a<td>b<tr><td>c</table>",
        [
            (
                "table",
                [],
                [
                    (
                        "tbody",
                        [],
                        [
                            (
                                "tr",
                                [],
                                [
                                    ("td", [], [("#t", "a")]),
                                    ("td", [], [("#t", "b")]),
                                ],
                            ),
                            ("tr", [], [("td", [], [("#t", "c")])]),
                        ],
                    )
                ],
            )
        ],
    ),
    "div_closes_open_p": (
        "<div><p>para<div>next</div></div>",
        [
            (
                "div",
                [],
                [
                    ("p", [], [("#t", "para")]),
                    ("div", [], [("#t", "next")]),
                ],
            )
        ],
    ),
    "void_with_trailing_slash_value": (
        "<br/><img src=/img/1.png/>",
        [("br", [], []), ("img", [("src", "/img/1.png/")], [])],
    ),
    "valueless_attr_then_selfclose": (
        "<input checked/>after",
        [("input", [("checked", "")], []), ("#t", "after")],
    ),
    "dt_dd_chain": (
        "<dl><dt>t<dd>d<dt>t2</dl>",
        [
            (
                "dl",
                [],
                [
                    ("dt", [], [("#t", "t")]),
                    ("dd", [], [("#t", "d")]),
                    ("dt", [], [("#t", "t2")]),
                ],
            )
        ],
    ),
    "truncated_document": (
        "<div><p>cut off mid",
        [("div", [], [("p", [], [("#t", "cut off mid")])])],
    ),
    # -- foster parenting (html5: content illegal inside table context
    # is relocated to just before the table) --------------------------
    "foster_text_in_row": (
        "<table><tr>stray<td>x</td></tr></table>",
        [
            ("#t", "stray"),
            (
                "table",
                [],
                [("tbody", [], [("tr", [], [("td", [], [("#t", "x")])])])],
            ),
        ],
    ),
    "foster_text_in_table_and_tail": (
        "<table>junk<tr><td>a</td></table>after",
        [
            ("#t", "junk"),
            (
                "table",
                [],
                [("tbody", [], [("tr", [], [("td", [], [("#t", "a")])])])],
            ),
            ("#t", "after"),
        ],
    ),
    "foster_element_then_row_clears_it": (
        "<table><b>bold<tr><td>x</td></table>",
        [
            ("b", [], [("#t", "bold")]),
            (
                "table",
                [],
                [("tbody", [], [("tr", [], [("td", [], [("#t", "x")])])])],
            ),
        ],
    ),
    "foster_block_in_table": (
        "<table><div>block</div><tr><td>a</td></table>",
        [
            ("div", [], [("#t", "block")]),
            (
                "table",
                [],
                [("tbody", [], [("tr", [], [("td", [], [("#t", "a")])])])],
            ),
        ],
    ),
    "hidden_input_not_fostered": (
        "<table><input type=hidden><tr><td>x</td></table>",
        [
            (
                "table",
                [],
                [
                    ("input", [("type", "hidden")], []),
                    ("tbody", [], [("tr", [], [("td", [], [("#t", "x")])])]),
                ],
            )
        ],
    ),
    "whitespace_kept_inside_table": (
        "<table> <tr><td>a</td></tr> </table>",
        [
            (
                "table",
                [],
                [
                    ("#t", " "),
                    (
                        "tbody",
                        [],
                        [
                            ("tr", [], [("td", [], [("#t", "a")])]),
                            ("#t", " "),
                        ],
                    ),
                ],
            )
        ],
    ),
    # -- adoption agency (simple case: misnested formatting) ----------
    "adoption_bi_misnest": (
        "<b><i>bold italic</b>italic</i>",
        [
            ("b", [], [("i", [], [("#t", "bold italic")])]),
            ("i", [], [("#t", "italic")]),
        ],
    ),
    "adoption_no_content_no_clone": (
        "<b><i></b></i>x",
        [("b", [], [("i", [], [])]), ("#t", "x")],
    ),
    "adoption_reopens_inside_block": (
        "<b><i></b><div>y</div>",
        [
            ("b", [], [("i", [], [])]),
            ("div", [], [("i", [], [("#t", "y")])]),
        ],
    ),
    # -- implicit table sections (html5 "in table" synthesis) ---------
    "implicit_tbody_bare_row": (
        "<table><tr><td>x</td></tr></table>",
        [
            (
                "table",
                [],
                [("tbody", [], [("tr", [], [("td", [], [("#t", "x")])])])],
            )
        ],
    ),
    "implicit_tbody_bare_cell": (
        "<table><td>x</table>",
        [
            (
                "table",
                [],
                [("tbody", [], [("tr", [], [("td", [], [("#t", "x")])])])],
            )
        ],
    ),
    "implicit_colgroup": (
        "<table><col><tr><td>a</table>",
        [
            (
                "table",
                [],
                [
                    ("colgroup", [], [("col", [], [])]),
                    ("tbody", [], [("tr", [], [("td", [], [("#t", "a")])])]),
                ],
            )
        ],
    ),
    "thead_keeps_own_rows": (
        "<table><thead><tr><th>h</table>",
        [
            (
                "table",
                [],
                [("thead", [], [("tr", [], [("th", [], [("#t", "h")])])])],
            )
        ],
    ),
    # -- adoption agency (cross-block: the spec's worked example) -----
    "adoption_cross_block": (
        "<b>1<p>2</b>3</p>",
        [
            ("b", [], [("#t", "1")]),
            ("p", [], [("b", [], [("#t", "2")]), ("#t", "3")]),
        ],
    ),
    "adoption_cross_block_intermediate": (
        "<b>W<i>X<p>Y</b>Z</p>",
        [
            ("b", [], [("#t", "W"), ("i", [], [("#t", "X")])]),
            (
                "i",
                [],
                [("p", [], [("b", [], [("#t", "Y")]), ("#t", "Z")])],
            ),
        ],
    ),
    # -- formatting end tags respect scope boundaries -----------------
    "formatting_scoped_to_cell": (
        "<b>out<table><tr><td></b>in</td></tr></table>tail",
        [
            (
                "b",
                [],
                [
                    ("#t", "out"),
                    (
                        "table",
                        [],
                        [
                            (
                                "tbody",
                                [],
                                [("tr", [], [("td", [], [("#t", "in")])])],
                            )
                        ],
                    ),
                    ("#t", "tail"),
                ],
            )
        ],
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_malformed_recovery(name):
    html, want = CASES[name]
    assert shape(parse_document(html)) == want, name


@pytest.mark.parametrize("name", sorted(CASES))
def test_fast_equals_stdlib(name):
    html, _ = CASES[name]
    assert shape(parse_document(html)) == shape(
        parse_document_stdlib(html)
    ), name
