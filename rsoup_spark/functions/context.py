"""Heading-hierarchy context extraction around an element.

Reimplements /root/reference/src/extractors/context_v1.rs:

* ``locate_content_before_and_after``  -- context_v1.rs:558-615
* ``flatten_tree_recur``               -- context_v1.rs:409-477
* ``flatten_node_recur``               -- context_v1.rs:479-545
* ``extract_context``                  -- context_v1.rs:124-174
* ``ContentHierarchy`` model           -- /root/reference/src/models/content_hierarchy.rs:11-26

The reference also ships an iterative ("InvTree") variant to dodge Rust
stack overflows; its own tests prove it equivalent to the recursive one
(test_context_extractor.rs:82-84), so only the recursive spec is ported
(SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional

from .dom import Node
from .text import (
    BLOCK_ELEMENTS,
    DEFAULT_DISCARD_TAGS,
    DEFAULT_IGNORED_TAGS,
    HEADER_ELEMENTS,
    PSEUDO_TAG,
    SAME_CONTENT_LEVEL_ELEMENTS,
    RichText,
    get_rich_text,
    get_rich_text_from_seq,
)


class ContentHierarchy:
    """One section level on the path to the element
    (content_hierarchy.rs:11-26)."""

    __slots__ = ("level", "heading", "content_before", "content_after")

    def __init__(self, level: int, heading: RichText) -> None:
        self.level = level
        self.heading = heading
        self.content_before: list[RichText] = []
        self.content_after: list[RichText] = []

    def to_dict(self) -> dict:
        return {
            "level": self.level,
            "heading": self.heading.to_dict(),
            "content_before": [c.to_dict() for c in self.content_before],
            "content_after": [c.to_dict() for c in self.content_after],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ContentHierarchy":
        ch = cls(d["level"], RichText.from_dict(d["heading"]))
        ch.content_before = [RichText.from_dict(x) for x in d["content_before"]]
        ch.content_after = [RichText.from_dict(x) for x in d["content_after"]]
        return ch

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"ContentHierarchy(level={self.level}, heading={self.heading!r}, "
            f"before={self.content_before!r}, after={self.content_after!r})"
        )


class _RefTree:
    """Vec-backed tree of references to DOM nodes (SimpleTree analogue).

    ``add_child(parent, child)`` re-roots at ``parent`` when ``child`` is
    the current root -- that is how the bottom-up ancestor walk in
    ``locate_content_before_and_after`` grows the tree upward
    (simple_tree.rs:79-84).
    """

    __slots__ = ("nodes", "children", "root")

    def __init__(self) -> None:
        self.nodes: list[Node] = []
        self.children: list[list[int]] = []
        self.root = 0

    def add_node(self, node: Node) -> int:
        self.nodes.append(node)
        self.children.append([])
        return len(self.nodes) - 1

    def add_child(self, parent: int, child: int) -> None:
        if child == self.root:
            self.root = parent
        self.children[parent].append(child)

    def __len__(self) -> int:
        return len(self.nodes)


class ContextExtractor:
    """Collects the heading hierarchy plus text before/after an element."""

    def __init__(
        self,
        ignored_tags: Optional[set[str]] = None,
        discard_tags: Optional[set[str]] = None,
        same_content_level_elements: Optional[set[str]] = None,
        header_elements: Optional[set[str]] = None,
        only_keep_inline_tags: bool = True,
    ) -> None:
        self.ignored_tags = frozenset(
            ignored_tags if ignored_tags is not None else DEFAULT_IGNORED_TAGS
        )
        self.discard_tags = frozenset(
            discard_tags if discard_tags is not None else DEFAULT_DISCARD_TAGS
        )
        self.same_content_level_elements = frozenset(
            same_content_level_elements
            if same_content_level_elements is not None
            else SAME_CONTENT_LEVEL_ELEMENTS
        )
        self.header_elements = frozenset(
            header_elements if header_elements is not None else HEADER_ELEMENTS
        )
        self.only_keep_inline_tags = only_keep_inline_tags

    # -- main entry (context_v1.rs:124-174) --------------------------------
    def extract_context(self, element: Node) -> list[ContentHierarchy]:
        tree_before, tree_after = self.locate_content_before_and_after(element)

        context_before: list[RichText] = []
        context_after: list[RichText] = []
        if len(tree_before):
            self.flatten_tree(tree_before, tree_before.root, context_before)
        if len(tree_after):
            self.flatten_tree(tree_after, tree_after.root, context_after)

        context = [ContentHierarchy(0, RichText.empty())]
        for rich in context_before:
            tag = rich.get_tag()
            if tag in self.header_elements:
                context.append(ContentHierarchy(int(tag[1:]), rich))
            else:
                context[-1].content_before.append(rich)

        # keep only the strictly-increasing heading chain, scanning
        # backwards (context_v1.rs:156-165)
        chain: list[ContentHierarchy] = []
        floor = 10
        for ch in reversed(context):
            if ch.level < floor:
                floor = ch.level
                chain.append(ch)
        chain.reverse()
        chain[-1].content_after.extend(context_after)
        return chain

    # -- flattening (context_v1.rs:409-545) ---------------------------------
    def _flush_group(self, pending: list[Node], output: list[RichText]) -> None:
        if not pending:
            return
        rich = get_rich_text_from_seq(
            pending,
            self.ignored_tags,
            self.only_keep_inline_tags,
            self.discard_tags,
            self.header_elements,
        )
        if self.is_text_interesting(rich):
            output.append(rich)

    def flatten_tree(
        self, tree: _RefTree, node_id: int, output: list[RichText]
    ) -> None:
        """Flatten a located-content tree into a RichText list, grouping
        runs of consecutive text/inline siblings (context_v1.rs:409-477)."""
        node = tree.nodes[node_id]
        kid_ids = tree.children[node_id]
        if not kid_ids:
            self.flatten_node(node, output)
            return

        if node.tag not in BLOCK_ELEMENTS:
            # inline element carrying a subtree: flatten children directly
            for kid in kid_ids:
                self.flatten_tree(tree, kid, output)
            return

        pending: list[Node] = []
        for kid in kid_ids:
            child = tree.nodes[kid]
            if child.is_text:
                pending.append(child)
            elif child.is_element:
                if child.tag not in BLOCK_ELEMENTS:
                    pending.append(child)
                    continue
                self._flush_group(pending, output)
                pending = []
                self.flatten_tree(tree, kid, output)
        self._flush_group(pending, output)

    def flatten_node(self, node: Node, output: list[RichText]) -> None:
        """Flatten one DOM subtree (context_v1.rs:479-545)."""
        if node.is_text:
            output.append(RichText.from_str(node.text))
            return
        if not node.is_element:
            return
        if node.tag in self.discard_tags:
            return
        if node.tag in self.header_elements or node.tag not in BLOCK_ELEMENTS:
            output.append(
                get_rich_text(
                    node,
                    self.ignored_tags,
                    self.only_keep_inline_tags,
                    self.discard_tags,
                    self.header_elements,
                )
            )
            return

        pending: list[Node] = []
        for child in node.children:
            if child.is_text:
                pending.append(child)
            elif child.is_element:
                if child.tag not in BLOCK_ELEMENTS:
                    pending.append(child)
                    continue
                self._flush_group(pending, output)
                pending = []
                self.flatten_node(child, output)
        self._flush_group(pending, output)

    # -- location (context_v1.rs:558-615) -----------------------------------
    def locate_content_before_and_after(
        self, element: Node
    ) -> tuple[_RefTree, _RefTree]:
        """Everything rendered before the element (as a tree of whole
        sibling subtrees hung off the ancestor chain), plus following
        siblings up to the next same-content-level element."""
        tree_before = _RefTree()
        el = element
        while True:
            parent = el.parent
            if parent is None or not parent.is_element or parent.tag == "html":
                break
            pid = tree_before.add_node(parent)
            for sib in parent.children:
                if sib is el:
                    if el is not element:
                        # hang the already-built deeper subtree here, in
                        # document position, excluding `element` itself
                        tree_before.add_child(pid, tree_before.root)
                    break
                cid = tree_before.add_node(sib)
                tree_before.add_child(pid, cid)
            el = parent

        tree_after = _RefTree()
        if element.parent is not None:
            rid = tree_after.add_node(element.parent)
            for sib in element.next_siblings():
                if (
                    sib.is_element
                    and sib.tag in self.same_content_level_elements
                ):
                    break
                cid = tree_after.add_node(sib)
                tree_after.add_child(rid, cid)

        return tree_before, tree_after

    def is_text_interesting(self, rich: RichText) -> bool:
        """Drop empty pseudo-root-only texts (context_v1.rs:618-620)."""
        return not (
            rich.text == ""
            and len(rich.nodes) == 1
            and rich.get_tag() == PSEUDO_TAG
        )


def _clone_shallow(node: Node) -> Node:
    return Node(node.kind, tag=node.tag, attrs=dict(node.attrs),
                text=node.text)


def _is_block(node: Node) -> bool:
    return node.is_element and node.tag in BLOCK_ELEMENTS


def fix_tree(node: Node) -> list[Node]:
    """Split inline elements that illegally contain block elements
    (O25; reference ``rsoup/python/context_extractor.py:55-102``).

    ``<span>a<div>b</div>c</span>`` becomes the sequence
    ``[<span>a</span>, <div>b</div>, <span>c</span>]`` -- the legacy
    Python extractor's normalization.  The canonical Rust path (and
    our ``flatten_tree`` above) instead handles block-inside-inline
    during flattening, so this utility exists for API parity and for
    pipelines that want a normalized DOM up front.  Returns the
    replacement sequence for ``node``; like the reference, a leading
    block child leaves the first (empty) inline clone in place.
    """
    if not node.children:
        return [_clone_shallow(node)]

    if _is_block(node) or node.kind != "element":
        newself = _clone_shallow(node)
        for c in node.children:
            for piece in fix_tree(c):
                newself.append(piece)
        return [newself]

    # inline element: hoist block descendants out, splitting the
    # inline wrapper around them
    trees: list[Node] = [_clone_shallow(node)]
    for c in node.children:
        subtrees = fix_tree(c)
        if _is_block(c):
            trees.extend(subtrees)
        else:
            for subtree in subtrees:
                if _is_block(subtree):
                    # already normalized by the recursive call above
                    # (the reference re-runs fix_tree here, which only
                    # re-clones an identical tree)
                    trees.append(subtree)
                elif _is_block(trees[-1]):
                    # reopen the inline wrapper after a hoisted block
                    reopened = Node("element", tag=node.tag,
                                    attrs=dict(node.attrs))
                    reopened.append(subtree)
                    trees.append(reopened)
                else:
                    trees[-1].append(subtree)
    return trees
