"""Browser-faithful text + rich-text extraction.

Reimplements (from scratch, in Python, over our own DOM) the semantics of
the reference extractors:

* whitespace algebra   -- /root/reference/src/extractors/text/line.rs
* ``get_text``         -- /root/reference/src/extractors/text/get_text_v2.rs:19-77
* ``get_rich_text``    -- /root/reference/src/extractors/text/get_rich_text.rs:37-278
* inline/block sets    -- /root/reference/src/extractors/text/mod.rs:13-33
* RichText / to_html   -- /root/reference/src/models/rich_text.rs

Rules (documented at get_text_v2.rs:6-14):

1. each block element is rendered on its own line;
2. empty lines are skipped;
3. consecutive whitespace collapses to one space;
4. leading/trailing whitespace is removed;
5. (rich text only) leading space inside an element is moved outside of
   the element (get_rich_text.rs:24-28).

Offsets: the reference uses Rust byte offsets; we standardize on Python
codepoint offsets (SURVEY.md §1.2) -- our fixtures assert against this
convention.
"""

from __future__ import annotations

from typing import Iterator, Optional

from .dom import ELEMENT, TEXT, Node

PSEUDO_TAG = ""  # rich_text.rs:13

# https://developer.mozilla.org/en-US/docs/Web/HTML/Inline_elements
# (mod.rs:13-23)
INLINE_ELEMENTS = frozenset(
    {
        "a", "abbr", "acronym", "audio", "b", "bdi", "bdo", "big",
        "button", "cite", "canvas", "code", "data", "datalist", "del",
        "dfn", "em", "embed", "i", "iframe", "img", "input", "ins",
        "kbd", "label", "map", "mark", "meter", "object", "output",
        "picture", "progress", "q", "ruby", "s", "samp", "select",
        "slot", "small", "span", "strong", "sub", "sup", "svg",
        "template", "textarea", "time", "u", "tt", "var", "video", "wbr",
    }
)

# (mod.rs:26-33) -- note <br> and <li> count as block for line breaking
BLOCK_ELEMENTS = frozenset(
    {
        "body", "br", "address", "article", "aside", "blockquote",
        "details", "dialog", "dd", "div", "dl", "dt", "fieldset",
        "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
        "h4", "h5", "h6", "header", "hgroup", "hr", "li", "main",
        "nav", "ol", "p", "pre", "section", "table", "ul",
    }
)

# default tag policies (table.rs:44-61, context_v1.rs:52-75)
DEFAULT_DISCARD_TAGS = frozenset({"script", "style", "noscript", "table"})
DEFAULT_IGNORED_TAGS = frozenset({"div"})
DEFAULT_CELL_KEEP_TAGS = frozenset({"ol", "ul", "li"})
HEADER_ELEMENTS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
SAME_CONTENT_LEVEL_ELEMENTS = frozenset(
    {"table", "h1", "h2", "h3", "h4", "h5", "h6"}
)


class Line:
    """A render line; whitespace handled per line.rs:41-84.

    1. leading spaces removed;
    2. runs of whitespace collapse to one space;
    3. a trailing space is delayed, applied only when a further
       non-empty sentence arrives;
    4. with no delayed trailing space, a new sentence with leading
       whitespace contributes one separating space.
    """

    __slots__ = ("tokens", "_before", "_last", "has_trailing_space")

    def __init__(self) -> None:
        self.tokens: list[str] = []
        self._before = 0
        self._last = 0
        self.has_trailing_space = False

    def clear(self) -> None:
        self.tokens.clear()
        self._before = 0
        self._last = 0
        self.has_trailing_space = False

    def __len__(self) -> int:
        return self._before + self._last

    def append(self, sentence: str) -> None:
        body = sentence.lstrip()
        if not body:
            if self.tokens:
                self.has_trailing_space = True
            return

        self._before += self._last
        if self.has_trailing_space or (self.tokens and sentence[0].isspace()):
            self.tokens.append(" ")
            self._before += 1

        self._last = 0
        for word in body.split():
            self.tokens.append(word)
            self.tokens.append(" ")
            self._last += len(word) + 1
        self.tokens.pop()  # drop the trailing separator
        self._last -= 1
        self.has_trailing_space = sentence[-1].isspace()


class Paragraph:
    """Accumulates non-empty lines joined by newlines (line.rs:101-111)."""

    __slots__ = ("tokens", "_len")

    def __init__(self) -> None:
        self.tokens: list[str] = []
        self._len = 0

    def append(self, line: Line) -> None:
        if not line.tokens:
            return
        if self.tokens:
            self.tokens.append("\n")
            self._len += 1
        self.tokens.extend(line.tokens)
        self._len += len(line)

    def __len__(self) -> int:
        return self._len

    def to_string(self) -> str:
        return "".join(self.tokens)


# sentinels for the streaming renderers; they expose a ``kind`` so the
# hot loops dispatch on one attribute fetch + string compare
class _Marker:
    __slots__ = ("kind",)

    def __init__(self, kind: str) -> None:
        self.kind = kind


_BREAK = _Marker("__break__")
_EXIT = _Marker("__exit__")


def get_text(el: Node) -> str:
    """Plain rendered text of an element (get_text_v2.rs:19-77)."""
    stream: list = list(reversed(el.children))
    parts: list[str] = []
    line = Line()

    def flush() -> None:
        if line.tokens:
            parts.extend(line.tokens)
            parts.append("\n")
        line.clear()

    while stream:
        node = stream.pop()
        kind = node.kind
        if kind == TEXT:
            line.append(node.text)
        elif kind == ELEMENT:
            if node.tag in BLOCK_ELEMENTS:
                flush()
                stream.append(_BREAK)
            if node.children:
                stream.extend(reversed(node.children))
        elif kind == "__break__":
            flush()
        # comments / doctype ignored

    flush()
    if parts:
        parts.pop()  # drop last newline
    return "".join(parts)


_V1_WS = __import__("re").compile(r"\s+")


def get_text_v1(el: Node) -> str:
    r"""Plain rendered text, legacy v1 algorithm (get_text_v1.rs:24-85).

    Same block-element line structure as :func:`get_text` (v2), but
    each line is collapsed wholesale: raw text tokens joined, then
    ``\s+`` -> one space with leading/trailing trim (process_line,
    get_text_v1.rs:92-107) -- instead of v2's incremental Line token
    machinery.  The two agree on well-formed content; v1 is kept for
    parity with the reference API surface (text/mod.rs:2).
    """
    stream: list = list(reversed(el.children))
    lines: list[str] = []
    current: list[str] = []

    def flush() -> None:
        if current:
            line = _V1_WS.sub(" ", "".join(current)).strip()
            if line:
                lines.append(line)
            current.clear()

    while stream:
        node = stream.pop()
        kind = node.kind
        if kind == TEXT:
            current.append(node.text)
        elif kind == ELEMENT:
            if node.tag in BLOCK_ELEMENTS:
                flush()
                stream.append(_BREAK)
            if node.children:
                stream.extend(reversed(node.children))
        elif kind == "__break__":
            flush()
        # comments / doctype ignored

    flush()
    return "\n".join(lines)


class RichTextElement:
    """A tag span over the flat text (rich_text.rs:30-39)."""

    __slots__ = ("tag", "start", "end", "attrs")

    def __init__(self, tag: str, start: int, end: int, attrs: dict[str, str]):
        self.tag = tag
        self.start = start
        self.end = end
        self.attrs = attrs

    def to_dict(self) -> dict:
        return {
            "tag": self.tag,
            "start": self.start,
            "end": self.end,
            "attrs": dict(self.attrs),
        }

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, RichTextElement)
            and self.tag == other.tag
            and self.start == other.start
            and self.end == other.end
            and self.attrs == other.attrs
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"RichTextElement({self.tag!r}, {self.start}, {self.end})"


class RichText:
    """Flat text + a vec-backed tree of tag spans over it.

    The tree layout mirrors SimpleTree (simple_tree.rs:6-10): ``nodes`` is a
    flat list, ``children[i]`` lists child indices, ``root`` is the root
    index.  The root is a pseudo-element (PSEUDO_TAG) unless built from a
    real element.
    """

    __slots__ = ("text", "nodes", "children", "root")

    def __init__(
        self,
        text: str = "",
        nodes: Optional[list[RichTextElement]] = None,
        children: Optional[list[list[int]]] = None,
        root: int = 0,
    ) -> None:
        self.text = text
        self.nodes = nodes if nodes is not None else [
            RichTextElement(PSEUDO_TAG, 0, len(text), {})
        ]
        self.children = children if children is not None else [[]]
        self.root = root

    @classmethod
    def empty(cls) -> "RichText":
        rt = cls("")
        rt.nodes[0].end = 0
        return rt

    @classmethod
    def from_str(cls, text: str) -> "RichText":
        return cls(text)

    def get_tag(self) -> str:
        return self.nodes[self.root].tag

    def add_node(self, el: RichTextElement) -> int:
        self.nodes.append(el)
        self.children.append([])
        return len(self.nodes) - 1

    def add_child(self, parent: int, child: int) -> None:
        if child == self.root:
            self.root = parent
        self.children[parent].append(child)

    def iter_preorder(self) -> Iterator[int]:
        stack = [self.root]
        while stack:
            nid = stack.pop()
            yield nid
            stack.extend(reversed(self.children[nid]))

    def __len__(self) -> int:
        return len(self.text)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, RichText)
            and self.text == other.text
            and self.root == other.root
            and self.nodes == other.nodes
            and self.children == other.children
        )

    def to_dict(self) -> dict:
        return {
            "text": self.text,
            "element": {
                "root": self.root,
                "nodes": [n.to_dict() for n in self.nodes],
                "node2children": [list(c) for c in self.children],
            },
        }

    @classmethod
    def from_dict(cls, d: dict) -> "RichText":
        el = d["element"]
        return cls(
            text=d["text"],
            nodes=[
                RichTextElement(n["tag"], n["start"], n["end"], dict(n["attrs"]))
                for n in el["nodes"]
            ],
            children=[list(c) for c in el["node2children"]],
            root=el["root"],
        )

    def to_html(
        self, render_outer_element: bool = True, render_element_attrs: bool = False
    ) -> str:
        """Render back to HTML (rich_text.rs:146-238).

        Single pass over the preorder span list with a stack of tags
        awaiting their closing position.
        """
        out: list[str] = []
        open_stack: list[int] = []
        pointer = 0
        order = list(self.iter_preorder())
        if not render_outer_element:
            order = order[1:]

        for nid in order:
            node = self.nodes[nid]
            while open_stack:
                top = self.nodes[open_stack[-1]]
                if top.end <= node.start:
                    # an empty span that is a *direct child* of the open tag
                    # belongs inside it -- don't close yet
                    if node.start == node.end and nid in self.children[open_stack[-1]]:
                        break
                    out.append(self.text[pointer : top.end])
                    out.append(f"</{top.tag}>")
                    pointer = top.end
                    open_stack.pop()
                else:
                    break

            out.append(self.text[pointer : node.start])
            if render_element_attrs and node.attrs:
                attrs = "".join(
                    f' {k}="{v.replace(chr(34), chr(92) + chr(34))}"'
                    for k, v in node.attrs.items()
                )
                out.append(f"<{node.tag}{attrs}>")
            else:
                out.append(f"<{node.tag}>")
            pointer = node.start
            open_stack.append(nid)

        for nid in reversed(open_stack):
            node = self.nodes[nid]
            out.append(self.text[pointer : node.end])
            out.append(f"</{node.tag}>")
            pointer = node.end

        out.append(self.text[pointer:])
        return "".join(out)

    def __repr__(self) -> str:  # pragma: no cover
        return f"`{self.to_html(True, False)}`"


def get_rich_text(
    el: Node,
    ignored_tags: frozenset = frozenset(),
    only_inline_tags: bool = True,
    discard_tags: frozenset = frozenset(),
    keep_tags: frozenset = frozenset(),
) -> RichText:
    """Rendered text plus the tag spans that produced it.

    Port of get_rich_text.rs:37-82 semantics: same whitespace rules as
    :func:`get_text`, plus span tracking with the leading-space-moved-
    outside rule.  ``discard_tags`` drop whole subtrees; ``ignored_tags``
    keep text but don't track the tag; ``keep_tags`` always track;
    otherwise only inline tags are tracked when ``only_inline_tags``.
    """
    if el.kind == ELEMENT:
        root = RichTextElement(el.tag, 0, 0, dict(el.attrs))
    else:
        root = RichTextElement(PSEUDO_TAG, 0, 0, {})
    rt = RichText("")
    rt.nodes = [root]
    rt.children = [[]]
    rt.root = 0
    stream: list = list(reversed(el.children))
    return _rich_text_from_stream(
        stream, rt, ignored_tags, only_inline_tags, discard_tags, keep_tags
    )


def get_rich_text_from_seq(
    seq: list[Node],
    ignored_tags: frozenset = frozenset(),
    only_inline_tags: bool = True,
    discard_tags: frozenset = frozenset(),
    keep_tags: frozenset = frozenset(),
) -> RichText:
    """Rich text of a sequence of sibling nodes under a pseudo root
    (get_rich_text.rs:84-119)."""
    rt = RichText("")
    rt.nodes = [RichTextElement(PSEUDO_TAG, 0, 0, {})]
    rt.children = [[]]
    rt.root = 0
    stream: list = list(reversed(seq))
    return _rich_text_from_stream(
        stream, rt, ignored_tags, only_inline_tags, discard_tags, keep_tags
    )


def _rich_text_from_stream(
    stream: list,
    rt: RichText,
    ignored_tags: frozenset,
    only_inline_tags: bool,
    discard_tags: frozenset,
    keep_tags: frozenset,
) -> RichText:
    """Core renderer (get_rich_text.rs:121-278).

    Elements record, at entry, the *token index* (in ``start``) and the
    *char position* (in ``end``) where their content begins; at exit both
    are fixed up to final char offsets, skipping a leading separator so
    that a leading space inside the element lands outside of it.
    """
    paragraph = Paragraph()
    line = Line()
    # (stream length at push, node id) -- stack of open tracked elements
    stack: list[tuple[int, int]] = [(0, rt.root)]

    while stream:
        node = stream.pop()
        kind = node.kind

        if kind == TEXT:
            line.append(node.text)
            continue

        if kind == "__break__":
            paragraph.append(line)
            line.clear()
            continue

        if kind == "__exit__":
            # close the innermost tracked element
            assert len(stream) == stack[-1][0], "exit marker out of sync"
            _, nid = stack.pop()
            el = rt.nodes[nid]
            start_token = el.start
            start_pos = el.end

            # the still-open line, if non-empty, will be joined to the
            # paragraph by one newline later
            shifted = 1 if len(paragraph) > 0 and len(line) > 0 else 0

            ptoks = paragraph.tokens
            if len(ptoks) > start_token:
                # the element's first token was already merged into the
                # paragraph; skip a leading separator if present
                if ptoks[start_token] in (" ", "\n"):
                    start_pos += 1
            else:
                ltoken = start_token - len(ptoks)
                if ltoken < len(line.tokens) and line.tokens[ltoken] == " ":
                    start_pos += 1
                start_pos += shifted
            el.start = start_pos
            el.end = len(paragraph) + len(line) + shifted
            continue

        if kind != ELEMENT:
            continue  # comments etc.

        tag = node.tag
        if tag in discard_tags:
            continue

        if tag in BLOCK_ELEMENTS:
            paragraph.append(line)
            line.clear()
            stream.append(_BREAK)

        if tag in keep_tags or (
            tag not in ignored_tags
            and (not only_inline_tags or tag in INLINE_ELEMENTS)
        ):
            el = RichTextElement(
                tag,
                len(paragraph.tokens) + len(line.tokens),  # token index
                len(paragraph) + len(line),  # char position
                dict(node.attrs),
            )
            nid = rt.add_node(el)
            rt.add_child(stack[-1][1], nid)
            stack.append((len(stream), nid))
            stream.append(_EXIT)

        stream.extend(reversed(node.children))

    paragraph.append(line)
    rt.text = paragraph.to_string()
    rt.nodes[rt.root].end = len(rt.text)
    return rt
