"""Document facade + a small CSS selector.

API parity with the reference's ad-hoc extraction surface:

* ``Document(url, html)`` + ``select(css)``  -- /root/reference/src/extractors/mod.rs:13-38
* ``ElementView`` accessors                  -- src/extractors/elementrefview.rs:22-91
  (name/id/classes/attr/has_class/text/rich text/nested select)

The selector supports the subset the reference tests exercise: tag,
``#id``, ``.class``, compound selectors (``tag.class#id``), the
descendant combinator (whitespace), and ``,`` unions.  Anything fancier
raises ValueError -- documented divergence from the full CSS engine the
Rust core gets from the `scraper` crate.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

from .dom import Node, parse_document
from .text import (
    DEFAULT_DISCARD_TAGS,
    DEFAULT_IGNORED_TAGS,
    get_rich_text,
    get_text,
)

_PART = re.compile(r"([a-zA-Z][\w-]*|\*)?((?:[.#][\w:-]+)*)$")


def _parse_simple(sel: str) -> tuple[Optional[str], list[str], list[str]]:
    """'tag.cls#id' -> (tag, classes, ids)."""
    m = _PART.match(sel)
    if not m or (not m.group(1) and not m.group(2)):
        raise ValueError(f"unsupported selector: {sel!r}")
    tag = m.group(1) if m.group(1) and m.group(1) != "*" else None
    classes, ids = [], []
    for piece in re.findall(r"[.#][\w:-]+", m.group(2) or ""):
        (classes if piece[0] == "." else ids).append(piece[1:])
    return tag, classes, ids


def _matches(node: Node, simple: tuple) -> bool:
    tag, classes, ids = simple
    if not node.is_element:
        return False
    if tag and node.tag != tag:
        return False
    if ids and node.attrs.get("id") not in ids:
        return False
    if classes:
        have = node.attrs.get("class", "").split()
        if not all(c in have for c in classes):
            return False
    return True


def css_select(root: Node, css: str) -> list[Node]:
    """Descendant-combinator CSS subset over our DOM, document order."""
    out: list[Node] = []
    seen: set[int] = set()
    for alt in css.split(","):
        chain = [_parse_simple(p) for p in alt.split()]
        if not chain:
            continue
        _select_chain(root, chain, 0, out, seen)
    out.sort(key=lambda n: _doc_order(root, n))
    return out


def _select_chain(node: Node, chain, depth: int, out, seen) -> None:
    for child in node.children:
        if child.is_element:
            if _matches(child, chain[depth]):
                if depth == len(chain) - 1:
                    if id(child) not in seen:
                        seen.add(id(child))
                        out.append(child)
                else:
                    _select_chain(child, chain, depth + 1, out, seen)
            # descendant combinator: the chain may restart deeper
            _select_chain(child, chain, depth, out, seen)


def _doc_order(root: Node, target: Node) -> int:
    for i, n in enumerate(root.iter_subtree()):
        if n is target:
            return i
    return 1 << 30


class ElementView:
    """Accessor wrapper (elementrefview.rs:22-91)."""

    def __init__(self, node: Node) -> None:
        self.node = node

    @property
    def name(self) -> str:
        return self.node.tag

    @property
    def id(self) -> Optional[str]:
        return self.node.attrs.get("id")

    @property
    def classes(self) -> list[str]:
        return self.node.attrs.get("class", "").split()

    def attr(self, name: str) -> Optional[str]:
        return self.node.attrs.get(name)

    @property
    def attrs(self) -> dict[str, str]:
        return dict(self.node.attrs)

    def has_class(self, cls: str) -> bool:
        return cls in self.classes

    def select(self, css: str) -> list["ElementView"]:
        return [ElementView(n) for n in css_select(self.node, css)]

    def get_text(self) -> str:
        return get_text(self.node)

    def get_rich_text(
        self,
        ignored_tags=DEFAULT_IGNORED_TAGS,
        only_inline_tags: bool = True,
        discard_tags=DEFAULT_DISCARD_TAGS,
        keep_tags=frozenset(),
    ):
        return get_rich_text(
            self.node,
            frozenset(ignored_tags),
            only_inline_tags,
            frozenset(discard_tags),
            frozenset(keep_tags),
        )

    def html(self) -> str:
        return render_html(self.node)

    def inner_html(self) -> str:
        return "".join(render_html(c) for c in self.node.children)


class Document:
    """url + parsed tree (mod.rs:13-26)."""

    def __init__(self, url: str, html: str) -> None:
        self.url = url
        self.root = parse_document(html)

    def select(self, css: str) -> list[ElementView]:
        return [ElementView(n) for n in css_select(self.root, css)]


_VOID = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"}
)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def render_html(node: Node) -> str:
    """Serialize a DOM subtree back to HTML (ElementRefView::html)."""
    if node.is_text:
        return _esc(node.text)
    if not node.is_element:
        return "".join(render_html(c) for c in node.children)
    attrs = "".join(
        f' {k}="{v.replace(chr(34), "&quot;")}"' for k, v in node.attrs.items()
    )
    inner = "".join(render_html(c) for c in node.children)
    if node.tag in _VOID and not node.children:
        return f"<{node.tag}{attrs}/>"
    return f"<{node.tag}{attrs}>{inner}</{node.tag}>"
