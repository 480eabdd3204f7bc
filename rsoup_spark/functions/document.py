"""Document facade + a small CSS selector.

API parity with the reference's ad-hoc extraction surface:

* ``Document(url, html)`` + ``select(css)``  -- /root/reference/src/extractors/mod.rs:13-38
* ``ElementView`` accessors                  -- src/extractors/elementrefview.rs:22-91
  (name/id/classes/attr/has_class/text/rich text/nested select)

The selector covers what the reference gets from the `scraper` crate
for its ad-hoc extraction surface: type/`*`, ``#id``, ``.class``,
attribute selectors (``[attr]``, ``=``, ``~=``, ``|=``, ``^=``, ``$=``,
``*=``), compounds, all four combinators (descendant, ``>``, ``+``,
``~``), ``,`` unions, and the structural pseudo-classes
``:first-child``/``:last-child``/``:only-child``/``:nth-child()``/
``:nth-last-child()``/``:not(simple)``.  Unsupported pseudo-classes
raise ValueError (documented divergence: no pseudo-elements or
state/tree-order pseudos the extraction surface never needs).
Scoping mirrors scraper's ElementRef::select: candidate matches come
from the subtree of the node ``select`` was called on, but ancestor /
sibling combinators are evaluated against the full document, so a
nested ``section.select('.outer p')`` matches when ``.outer`` is an
ancestor of the scope element.
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

_TOKEN = re.compile(
    r"""\s*(,)\s*
      | \s*([>+~])\s*
      | (\s+)
      | ([a-zA-Z][\w-]*|\*)
      | \#([\w:-]+)
      | \.([\w:-]+)
      | \[\s*([\w-]+)\s*(?:([~^$*|]?=)\s*
            (?:"([^"]*)"|'([^']*)'|([^\]\s]+))\s*)?\]
      | :([\w-]+)(?:\(([^()]*)\))?
    """,
    re.X,
)

_SUPPORTED_PSEUDOS = frozenset(
    {"first-child", "last-child", "only-child", "nth-child",
     "nth-last-child", "not"}
)


class _Simple:
    """One compound simple selector: tag + ids + classes + attrs + pseudos."""

    __slots__ = ("tag", "ids", "classes", "attrs", "pseudos")

    def __init__(self) -> None:
        self.tag: Optional[str] = None
        self.ids: list[str] = []
        self.classes: list[str] = []
        self.attrs: list[tuple[str, Optional[str], str]] = []
        self.pseudos: list[tuple[str, object]] = []

    def empty(self) -> bool:
        return (self.tag is None and not self.ids and not self.classes
                and not self.attrs and not self.pseudos)


def _parse_nth(arg: str) -> tuple[int, int]:
    """'odd'/'even'/'5'/'2n+1'/'-n+3' -> (a, b) of an+b."""
    s = arg.strip().lower().replace(" ", "")
    if s == "odd":
        return 2, 1
    if s == "even":
        return 2, 0
    m = re.fullmatch(r"([+-]?\d*)n([+-]\d+)?", s)
    if m:
        a_raw = m.group(1)
        a = 1 if a_raw in ("", "+") else (-1 if a_raw == "-" else int(a_raw))
        return a, int(m.group(2)) if m.group(2) else 0
    try:
        return 0, int(s)
    except ValueError:
        raise ValueError(f"unsupported :nth-child() argument: {arg!r}")


def _parse_selector(css: str) -> list[tuple[list[_Simple], list[str]]]:
    """css -> union of chains; each chain is (compounds, combinators)
    with combinators[i] relating compounds[i] -> compounds[i+1]."""
    chains: list[tuple[list[_Simple], list[str]]] = []
    compounds: list[_Simple] = []
    combs: list[str] = []
    cur: Optional[_Simple] = None
    pending: Optional[str] = None
    pos = 0
    css = css.strip()

    def flush_compound() -> None:
        nonlocal cur, pending
        if cur is None or cur.empty():
            if pending is not None and pending != " ":
                raise ValueError(f"dangling combinator in {css!r}")
            cur = None
            pending = None
            return
        if compounds:
            combs.append(pending or " ")
        elif pending is not None and pending != " ":
            # '> p' or 'div, > p': combinator with no left-hand compound
            raise ValueError(f"dangling combinator in {css!r}")
        compounds.append(cur)
        cur = None
        pending = None

    def flush_chain() -> None:
        nonlocal compounds, combs
        flush_compound()
        if not compounds:
            raise ValueError(f"empty selector in {css!r}")
        chains.append((compounds, combs))
        compounds, combs = [], []

    while pos < len(css):
        m = _TOKEN.match(css, pos)
        if m is None:
            raise ValueError(f"unsupported selector syntax at {css[pos:]!r}")
        pos = m.end()
        (union, comb, ws, tag, el_id, cls,
         a_name, a_op, a_dq, a_sq, a_bare, p_name, p_arg) = m.groups()
        if union:
            flush_chain()
            continue
        if comb or ws:
            if cur is not None and not cur.empty():
                flush_compound()
                pending = comb or " "
            elif comb:
                # '  > ' after a flushed compound upgrades the pending
                pending = comb
            continue
        if cur is None:
            cur = _Simple()
        if tag:
            if tag != "*":
                cur.tag = tag.lower()
        elif el_id:
            cur.ids.append(el_id)
        elif cls:
            cur.classes.append(cls)
        elif a_name:
            val = a_dq if a_dq is not None else (
                a_sq if a_sq is not None else a_bare)
            cur.attrs.append(
                (a_name.lower(), a_op, val if val is not None else "")
            )
        elif p_name:
            name = p_name.lower()
            if name not in _SUPPORTED_PSEUDOS:
                raise ValueError(f"unsupported pseudo-class :{p_name}")
            if name in ("nth-child", "nth-last-child"):
                if p_arg is None:
                    raise ValueError(f":{name} needs an argument")
                cur.pseudos.append((name, _parse_nth(p_arg)))
            elif name == "not":
                if p_arg is None:
                    raise ValueError(":not needs an argument")
                inner = _parse_selector(p_arg)
                if len(inner) != 1 or len(inner[0][0]) != 1:
                    raise ValueError(":not() takes one simple selector")
                cur.pseudos.append((name, inner[0][0][0]))
            else:
                cur.pseudos.append((name, None))
    flush_chain()
    return chains


def _attr_match(node: Node, name: str, op: Optional[str], val: str) -> bool:
    have = node.attrs.get(name)
    if have is None:
        return False
    if op is None:
        return True
    if op == "=":
        return have == val
    if op == "~=":
        return val in have.split()
    if op == "|=":
        return have == val or have.startswith(val + "-")
    if op == "^=":
        return bool(val) and have.startswith(val)
    if op == "$=":
        return bool(val) and have.endswith(val)
    if op == "*=":
        return bool(val) and val in have
    raise ValueError(f"unsupported attribute operator {op!r}")


def _element_index(node: Node) -> tuple[int, int]:
    """(1-based position among element siblings, element sibling count)."""
    if node.parent is None:
        return 1, 1
    pos = 0
    total = 0
    for sib in node.parent.children:
        if sib.is_element:
            total += 1
            if sib is node:
                pos = total
    return pos, total


def _nth_hit(pos: int, ab: tuple[int, int]) -> bool:
    a, b = ab
    if a == 0:
        return pos == b
    return (pos - b) % a == 0 and (pos - b) // a >= 0


def _matches(node: Node, s: _Simple) -> bool:
    if not node.is_element:
        return False
    if s.tag and node.tag != s.tag:
        return False
    if s.ids and any(node.attrs.get("id") != i for i in s.ids):
        return False
    if s.classes:
        have = node.attrs.get("class", "").split()
        if not all(c in have for c in s.classes):
            return False
    for name, op, val in s.attrs:
        if not _attr_match(node, name, op, val):
            return False
    for p_name, arg in s.pseudos:
        if p_name == "not":
            if _matches(node, arg):
                return False
        else:
            pos, total = _element_index(node)
            if p_name == "first-child" and pos != 1:
                return False
            if p_name == "last-child" and pos != total:
                return False
            if p_name == "only-child" and total != 1:
                return False
            if p_name == "nth-child" and not _nth_hit(pos, arg):
                return False
            if p_name == "nth-last-child" and not _nth_hit(
                total - pos + 1, arg
            ):
                return False
    return True


def css_select(root: Node, css: str) -> list[Node]:
    """CSS matching over our DOM, document order, subtree-scoped."""
    chains = _parse_selector(css)

    def prev_element_siblings(n: Node) -> Iterator[Node]:
        if n.parent is None:
            return
        for sib in n.parent.children:
            if sib is n:
                return
            if sib.is_element:
                yield sib

    def ok(node: Node, compounds: list[_Simple], combs: list[str],
           i: int) -> bool:
        if not _matches(node, compounds[i]):
            return False
        if i == 0:
            return True
        c = combs[i - 1]
        # ancestor/sibling combinators walk the FULL document, past the
        # scope root: scraper's ElementRef::select restricts candidates
        # to the subtree but matches the selector against the whole
        # tree, so section.select('.outer p') finds the <p> when .outer
        # is an ancestor of the scope element
        if c == " ":
            p = node.parent
            while p is not None:
                if ok(p, compounds, combs, i - 1):
                    return True
                p = p.parent
            return False
        if c == ">":
            p = node.parent
            return p is not None and ok(p, compounds, combs, i - 1)
        if c == "+":
            prev = None
            for sib in prev_element_siblings(node):
                prev = sib
            return prev is not None and ok(prev, compounds, combs, i - 1)
        if c == "~":
            return any(
                ok(sib, compounds, combs, i - 1)
                for sib in prev_element_siblings(node)
            )
        raise ValueError(f"unsupported combinator {c!r}")

    out: list[Node] = []
    for node in root.iter_subtree():
        if node is root or not node.is_element:
            continue
        for compounds, combs in chains:
            if ok(node, compounds, combs, len(compounds) - 1):
                out.append(node)
                break
    return out


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
