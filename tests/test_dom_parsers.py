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


def test_fuzz_tag_soup_equivalence():
    """Deterministic tag-soup fuzz over the recovery-heavy vocabulary
    (tables, formatting, blocks): the fast tokenizer and the stdlib
    builder must produce identical trees on every input, including the
    adoption-agency and implicit-tbody paths added in round 4."""
    import random

    vocab_open = [
        "<table>", "<tr>", "<td>", "<th>", "<tbody>", "<thead>",
        "<colgroup>", "<col>", "<b>", "<i>", "<em>", "<div>", "<p>",
        "<span>", "<ul>", "<li>", "<a href='/x'>", "<caption>",
        "<tfoot>", "<strong>", "<u>", "<dl>", "<dt>", "<dd>",
        "<select>", "<option>", "<img src=/i.png>", "<br/>",
        "<input type=hidden>", "<span class='a b'>",
        "<script>var a = 'x<b>';</script>", "<style>p>b{}</style>",
        "<!-- c -->", "<!DOCTYPE html>", "<td colspan=2>",
        "<div a=1 a=2>", "<p CLASS=Y>", "<a href='/x?a=1&amp;b'>",
    ]
    vocab_close = [
        "</table>", "</tr>", "</td>", "</b>", "</i>", "</em>",
        "</div>", "</p>", "</span>", "</ul>", "</li>", "</a>",
        "</tbody>", "</th>", "</caption>", "</strong>", "</u>",
        "</dl>", "</dt>", "</dd>", "</select>", "</option>",
        "</thead>", "</tfoot>", "</colgroup>",
        # malformed end tags: junk name, bogus-comment state, '</>'
        "</y=z>", "</b x>", "</ td>", "</>", "</",
    ]
    texts = ["x", " ", "y z", "&amp;", "&#65;", "1", "<", ">", '"']
    rng = random.Random(0xD0)
    for case in range(500):
        n = rng.randint(3, 40)
        parts = []
        for _ in range(n):
            r = rng.random()
            if r < 0.45:
                parts.append(rng.choice(vocab_open))
            elif r < 0.75:
                parts.append(rng.choice(vocab_close))
            else:
                parts.append(rng.choice(texts))
        html = "".join(parts)
        fast = tree_repr(_fast_parse(html))
        std = tree_repr(parse_document_stdlib(html))
        assert fast == std, f"case {case}: {html!r}"
