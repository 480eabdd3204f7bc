"""Fast tokenizer vs stdlib html.parser: tree equivalence on every
reference fixture plus adversarial snippets."""

from pathlib import Path

import pytest

from rsoup_spark.functions.dom import (
    Node,
    _fast_parse,
    parse_document_stdlib,
)

RES = Path("/root/reference/tests/resources")
FIXTURES = sorted(RES.rglob("*.html"))


def tree_repr(node: Node) -> list:
    if node.is_text:
        return ["#text", node.text]
    return [
        node.tag,
        sorted(node.attrs.items()),
        [tree_repr(c) for c in node.children],
    ]


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.name)
def test_fixture_equivalence(path):
    html = path.read_text()
    assert tree_repr(_fast_parse(html)) == tree_repr(
        parse_document_stdlib(html)
    )


@pytest.mark.parametrize(
    "html",
    [
        "plain text only",
        "<p>unclosed",
        "<p>a<b>b</p>c</b>",
        '<a title="x>y" href="/q?a=1&amp;b=2">t</a>',
        "<br/><img src='u'/><hr>",
        "<script>if (a<b && c>d) {}</script><p>after</p>",
        "<style>p>span{}</style>ok",
        "<!-- comment --><!DOCTYPE html><?pi?><p>x</p>",
        "<p>&lt;tag&gt; &amp; &nbsp; &#65;</p>",
        "<P CLASS='Y'><SPAN ID=z>m</SPAN></P>",
        "<td colspan=2 rowspan='3' data-x>v</td>",
        "<ul><li>a<li>b</ul>",
        "text < not a tag > more",
        "<a href=''></a><b attr=\"\"></b>",
        "<div a=1 a=2>dup</div>",
    ],
)
def test_adversarial_equivalence(html):
    assert tree_repr(_fast_parse(html)) == tree_repr(
        parse_document_stdlib(html)
    )
