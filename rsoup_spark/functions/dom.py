"""Minimal deterministic HTML DOM built on the stdlib ``html.parser``.

The reference engine (binh-vu/rsoup) parses HTML with html5ever
(``/root/reference/src/extractors/mod.rs:20-25``).  No third-party HTML
parser is available in this environment, so we build a small tree parser
on top of :class:`html.parser.HTMLParser`.  It is intentionally simple:

* entity references are decoded (``convert_charrefs=True``), matching
  html5ever's behaviour for ``&nbsp;`` etc.;
* void elements never take children;
* adjacent text chunks are merged into a single text node (html5ever
  also produces one text node per run);
* mismatched end tags pop up to the nearest matching open tag and are
  otherwise ignored (a pragmatic subset of html5 error recovery --
  divergences from html5ever's foster-parenting rules are documented
  in the test-suite; our fixtures are well-formed).

Parse semantics only matter relative to our own synthesized fixtures,
per SURVEY.md §7 risk 2.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

TEXT = "text"
ELEMENT = "element"
DOCUMENT = "document"

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# Elements whose raw content is character data, never markup.
RAWTEXT_ELEMENTS = frozenset({"script", "style"})

# HTML5 implied-end-tag rules (the malformed-input subset that matters
# for crawled pages): starting tag T implicitly closes an *immediately
# open* element whose tag is in _CLOSED_BY[T].  Walking only the top of
# the stack (repeatedly) keeps scope rules simple: a nested container
# (ul/table/...) sits between the new tag and any outer same-kind
# element, so outer elements are never closed through a boundary.
_P_CLOSERS = (
    "address article aside blockquote details div dl fieldset figcaption "
    "figure footer form h1 h2 h3 h4 h5 h6 header hr main nav ol p pre "
    "section table ul"
).split()
_CLOSED_BY: dict[str, frozenset[str]] = {t: frozenset({"p"}) for t in _P_CLOSERS}
_CLOSED_BY.update(
    {
        "li": frozenset({"li", "p"}),
        "dt": frozenset({"dt", "dd", "p"}),
        "dd": frozenset({"dt", "dd", "p"}),
        "td": frozenset({"td", "th", "p"}),
        "th": frozenset({"td", "th", "p"}),
        "tr": frozenset({"tr", "td", "th", "p"}),
        "thead": frozenset({"tr", "td", "th", "tbody", "p"}),
        "tbody": frozenset({"tr", "td", "th", "thead", "p"}),
        "tfoot": frozenset({"tr", "td", "th", "tbody", "thead", "p"}),
        "option": frozenset({"option"}),
        "optgroup": frozenset({"option", "optgroup"}),
    }
)


def _implied_close(stack: list["Node"], tag: str) -> None:
    closes = _CLOSED_BY.get(tag)
    if closes is None:
        return
    while len(stack) > 1 and stack[-1].tag in closes:
        stack.pop()


class Node:
    """One DOM node: document root, element, or text."""

    __slots__ = ("kind", "tag", "attrs", "text", "children", "parent")

    def __init__(
        self,
        kind: str,
        tag: str = "",
        attrs: Optional[dict[str, str]] = None,
        text: str = "",
    ) -> None:
        self.kind = kind
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.text = text
        self.children: list[Node] = []
        self.parent: Optional[Node] = None

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    @property
    def is_element(self) -> bool:
        return self.kind == ELEMENT

    @property
    def is_text(self) -> bool:
        return self.kind == TEXT

    # -- traversal helpers ------------------------------------------------
    def iter_subtree(self) -> Iterator["Node"]:
        """Preorder traversal including self."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def next_siblings(self) -> Iterator["Node"]:
        if self.parent is None:
            return
        seen = False
        for sib in self.parent.children:
            if seen:
                yield sib
            elif sib is self:
                seen = True

    # -- queries (the subset of CSS the reference tests use) --------------
    def find_all(self, tag: str) -> list["Node"]:
        """All descendant elements with the given tag, document order."""
        out = []
        for node in self.iter_subtree():
            if node is not self and node.is_element and node.tag == tag:
                out.append(node)
        return out

    def find_by_id(self, el_id: str) -> Optional["Node"]:
        for node in self.iter_subtree():
            if node.is_element and node.attrs.get("id") == el_id:
                return node
        return None

    def find_by_class(self, cls: str) -> list["Node"]:
        out = []
        for node in self.iter_subtree():
            if node.is_element and cls in node.attrs.get("class", "").split():
                out.append(node)
        return out

    def outer_text(self) -> str:
        parts = []
        for node in self.iter_subtree():
            if node.is_text:
                parts.append(node.text)
        return "".join(parts)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.is_text:
            return f"Text({self.text!r})"
        return f"<{self.tag} children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(DOCUMENT)
        self.stack: list[Node] = [self.root]

    # -- HTMLParser callbacks ---------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        attr_map: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_map:  # first occurrence wins (html5 rule)
                attr_map[k] = v if v is not None else ""
        _implied_close(self.stack, tag)
        node = Node(ELEMENT, tag=tag, attrs=attr_map)
        self.stack[-1].append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        attr_map: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_map:
                attr_map[k] = v if v is not None else ""
        self.stack[-1].append(Node(ELEMENT, tag=tag, attrs=attr_map))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignored (error recovery)

    def handle_data(self, data: str) -> None:
        if not data:
            return
        parent = self.stack[-1]
        if parent.children and parent.children[-1].is_text:
            parent.children[-1].text += data
        else:
            parent.append(Node(TEXT, text=data))

    # comments / doctype / PIs are dropped, as the reference ignores them
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass


import html as _htmlmod
import re as _re

# one-pass tokenizer: ~3x faster than html.parser (which pays for
# line/column tracking we never use).  Quoted '>' inside attributes is
# handled by the alternation in the attrs group.
_TOKEN = _re.compile(
    r"<!--.*?-->"
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|</\s*([a-zA-Z][a-zA-Z0-9:_.-]*)\s*>"
    r"|<([a-zA-Z][a-zA-Z0-9:_.-]*)((?:\"[^\"]*\"|'[^']*'|[^>])*)>",
    _re.S,
)
_ATTR = _re.compile(
    r"([^\s=/>]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)
_AMP = _re.compile(r"&")
_RAW_END = {
    "script": _re.compile(r"</script", _re.I),
    "style": _re.compile(r"</style", _re.I),
}


def _unescape(s: str) -> str:
    # html.unescape is comparatively slow; skip it when no entity present
    return _htmlmod.unescape(s) if "&" in s else s


def _fast_parse(html: str) -> Node:
    root = Node(DOCUMENT)
    stack = [root]
    pos = 0
    n = len(html)

    def add_text(raw: str) -> None:
        if not raw:
            return
        parent = stack[-1]
        text = _unescape(raw)
        last = parent.children[-1] if parent.children else None
        if last is not None and last.kind == TEXT:
            last.text += text
        else:
            parent.append(Node(TEXT, text=text))

    while pos < n:
        m = _TOKEN.search(html, pos)
        if m is None:
            add_text(html[pos:])
            break
        if m.start() > pos:
            add_text(html[pos : m.start()])
        pos = m.end()
        end_tag, start_tag, attrs_raw = m.group(1), m.group(2), m.group(3)

        if start_tag is not None:
            tag = start_tag.lower()
            attr_map: dict[str, str] = {}
            last_unquoted_end = -1
            if attrs_raw and ("=" in attrs_raw or attrs_raw.strip("/ \t\r\n")):
                for am in _ATTR.finditer(attrs_raw):
                    name = am.group(1).lower()
                    if name in attr_map:
                        continue
                    val = am.group(2)
                    if val is None:
                        val = am.group(3)
                    if val is None:
                        val = am.group(4)
                        if val is not None:
                            last_unquoted_end = am.end(4)
                    attr_map[name] = _unescape(val) if val else (val or "")
            # a trailing '/' marks self-closing ONLY when it is not the
            # last character of an unquoted attribute value
            # (`<a href=http://x.com/>` is a normal start tag whose href
            # keeps its trailing slash, per the HTML5 tokenizer)
            stripped = attrs_raw.rstrip()
            self_closing = (
                stripped.endswith("/") and last_unquoted_end != len(stripped)
            )
            _implied_close(stack, tag)
            node = Node(ELEMENT, tag=tag, attrs=attr_map)
            stack[-1].append(node)
            if tag in RAWTEXT_ELEMENTS and not self_closing:
                # consume raw content up to the closing tag
                em = _RAW_END[tag].search(html, pos)
                raw_end = em.start() if em else n
                if raw_end > pos:
                    node.append(Node(TEXT, text=html[pos:raw_end]))
                close = html.find(">", raw_end)
                pos = (close + 1) if close != -1 else n
            elif tag not in VOID_ELEMENTS and not self_closing:
                stack.append(node)
        elif end_tag is not None:
            tag = end_tag.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
        # comments / decls / PIs / CDATA dropped

    return root


def parse_document(html: str) -> Node:
    """Parse a full HTML document; returns the document root node.

    Uses the fast one-pass tokenizer; ``tests/test_dom_parsers.py``
    asserts tree equivalence with the stdlib ``html.parser`` build over
    every reference fixture.  Set ``RSOUP_SPARK_STDLIB_PARSER=1`` to
    force the stdlib path.
    """
    import os

    if os.environ.get("RSOUP_SPARK_STDLIB_PARSER"):
        return parse_document_stdlib(html)
    return _fast_parse(html)


def parse_document_stdlib(html: str) -> Node:
    """stdlib html.parser build (reference behaviour for equivalence
    tests; also the fallback if the tokenizer misbehaves on new input)."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def parse_fragment(html: str) -> Node:
    """Parse an HTML fragment; returns a pseudo-root element wrapping it.

    Mirrors html5ever's ``parse_fragment`` which wraps content in an
    ``<html>`` element (see the reference test
    ``tests/extractors/test_text_extractor.rs:37,88-89``).
    """
    doc = parse_document(html)
    wrapper = Node(ELEMENT, tag="html")
    for child in doc.children:
        wrapper.append(child)
    return wrapper
