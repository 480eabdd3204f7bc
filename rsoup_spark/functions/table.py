"""Table model + HTML table extraction.

Reimplements the reference semantics:

* Cell/Row/Table model      -- /root/reference/src/models/table/{cell,row,table}.rs
* ``Table.span()``          -- table.rs:63-181 (rowspan/colspan -> dense grid)
* ``Table.pad()``           -- table.rs:186-241 (ragged rows -> regular)
* table scan + extraction   -- /root/reference/src/extractors/table.rs:95-325
* table-id assignment       -- table.rs:168-186 (``url ? table_no=i``)
* href absolutization       -- /root/reference/src/misc/url_converter.rs:16-53

Everything here is pure Python over nested lists/dicts so it unit-tests
without Spark and runs data-parallel inside Arrow-batched UDFs
(one table per element, no cross-row state).
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urljoin, urlsplit, urlunsplit

from .context import ContentHierarchy, ContextExtractor
from .dom import Node, parse_document
from .text import (
    DEFAULT_CELL_KEEP_TAGS,
    DEFAULT_DISCARD_TAGS,
    DEFAULT_IGNORED_TAGS,
    RichText,
    get_rich_text,
    get_text,
)


class OverlapSpanError(ValueError):
    """rowspan/colspan collision during span() (error.rs OverlapSpanPyError)."""


class InvalidCellSpanError(ValueError):
    """colspan overflow not in the last column (InvalidCellSpanPyError)."""


class Cell:
    __slots__ = ("is_header", "rowspan", "colspan", "attrs", "value")

    def __init__(
        self,
        is_header: bool = False,
        rowspan: int = 1,
        colspan: int = 1,
        attrs: Optional[dict[str, str]] = None,
        value: Optional[RichText] = None,
    ) -> None:
        self.is_header = is_header
        self.rowspan = rowspan
        self.colspan = colspan
        self.attrs = attrs or {}
        self.value = value if value is not None else RichText.empty()

    def clone(self) -> "Cell":
        return Cell(self.is_header, self.rowspan, self.colspan, dict(self.attrs), self.value)

    def to_dict(self) -> dict:
        return {
            "is_header": self.is_header,
            "rowspan": self.rowspan,
            "colspan": self.colspan,
            "attrs": dict(self.attrs),
            "value": self.value.to_dict(),
        }


class Row:
    __slots__ = ("cells", "attrs")

    def __init__(self, cells: list[Cell], attrs: Optional[dict[str, str]] = None):
        self.cells = cells
        self.attrs = attrs or {}

    def to_list(self) -> list[str]:
        return [c.value.text for c in self.cells]

    def to_dict(self) -> dict:
        return {"cells": [c.to_dict() for c in self.cells], "attrs": dict(self.attrs)}


class Table:
    __slots__ = ("id", "url", "caption", "attrs", "context", "rows")

    def __init__(
        self,
        id: str = "",
        url: str = "",
        caption: str = "",
        attrs: Optional[dict[str, str]] = None,
        context: Optional[list[ContentHierarchy]] = None,
        rows: Optional[list[Row]] = None,
    ) -> None:
        self.id = id
        self.url = url
        self.caption = caption
        self.attrs = attrs or {}
        self.context = context or []
        self.rows = rows or []

    # -- normalization ----------------------------------------------------
    def span(self) -> "Table":
        """Copy spanning cells into every grid slot they cover (table.rs:63-181).

        Raises :class:`OverlapSpanError` when a rowspan collides with a
        colspan, :class:`InvalidCellSpanError` when a colspan overflows
        max columns anywhere but the last cell of a row.
        """
        if not self.rows:
            return Table(self.id, self.url, self.caption, dict(self.attrs), list(self.context), [])

        # max #cols: per-row cell count plus rowspan carry-down (table.rs:78-94)
        cols = [0] * len(self.rows)
        for i, row in enumerate(self.rows):
            cols[i] += len(row.cells)
            for cell in row.cells:
                for j in range(1, cell.rowspan):
                    if i + j < len(cols):
                        cols[i + j] += 1
        max_ncols = max(cols)

        pending: dict[tuple[int, int], Cell] = {}
        out_rows: list[Row] = []
        for pi, row in enumerate(self.rows):
            new_row: list[Cell] = []
            pj = 0
            for ci, ocell in enumerate(row.cells):
                cell = ocell.clone()
                ocolspan, orowspan = cell.colspan, cell.rowspan
                cell.colspan = 1
                cell.rowspan = 1

                # fill slots already claimed by rowspans from above
                while (pi, pj) in pending:
                    new_row.append(pending.pop((pi, pj)))
                    pj += 1

                for _ in range(ocolspan):
                    if (pi, pj) in pending:
                        raise OverlapSpanError(
                            f"rowspan/colspan overlap at ({pi},{pj})"
                        )
                    new_row.append(cell.clone())
                    for down in range(1, orowspan):
                        pending[(pi + down, pj)] = cell.clone()
                    pj += 1
                    if pj >= max_ncols:
                        # overflow is tolerated only in the last column
                        if ci != len(row.cells) - 1:
                            raise InvalidCellSpanError(
                                f"colspan overflow at row {pi} cell {ci}"
                            )
                        break

            while (pi, pj) in pending and pj < max_ncols:
                new_row.append(pending.pop((pi, pj)))
                pj += 1

            out_rows.append(Row(new_row, dict(row.attrs)))

        return Table(self.id, self.url, self.caption, dict(self.attrs), list(self.context), out_rows)

    def pad(self) -> Optional["Table"]:
        """Pad ragged rows with empty cells (table.rs:186-241).

        Returns None when the table is already regular.  A padding cell
        inherits ``is_header`` from the last existing cell of its row.
        """
        if not self.rows:
            return None
        ncols = len(self.rows[0].cells)
        if all(len(r.cells) == ncols for r in self.rows):
            return None
        max_ncols = max(len(r.cells) for r in self.rows)

        out_rows = []
        for row in self.rows:
            cells = list(row.cells)
            is_header = cells[-1].is_header if cells else False
            while len(cells) < max_ncols:
                cells.append(Cell(is_header=is_header))
            out_rows.append(Row(cells, dict(row.attrs)))
        return Table(self.id, self.url, self.caption, dict(self.attrs), list(self.context), out_rows)

    # -- views ------------------------------------------------------------
    def n_rows(self) -> int:
        return len(self.rows)

    def shape(self) -> tuple[int, int]:
        if not self.rows:
            return (0, 0)
        return (len(self.rows), len(self.rows[0].cells))

    def to_list(self) -> list[list[str]]:
        return [r.to_list() for r in self.rows]

    # -- iterators (O21: cell_iter.rs/row_iter.rs) -------------------------
    def get_row(self, ri: int) -> Row:
        return self.rows[ri]

    def get_cell(self, ri: int, ci: int) -> Cell:
        return self.rows[ri].cells[ci]

    def iter_rows(self):
        return iter(self.rows)

    def iter_cells(self):
        for row in self.rows:
            yield from row.cells

    def enumerate_cells(self):
        for ri, row in enumerate(self.rows):
            for ci, cell in enumerate(row.cells):
                yield ri, ci, cell

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "url": self.url,
            "caption": self.caption,
            "attrs": dict(self.attrs),
            "context": [c.to_dict() for c in self.context],
            "rows": [r.to_dict() for r in self.rows],
        }

    # -- serialization suite (O20, table.rs:309-390; postcard/base64 are
    # Rust-specific encodings -- JSON/dict/pickle cover the same fidelity
    # and Parquet is the columnar path) ------------------------------------
    @classmethod
    def from_dict(cls, d: dict) -> "Table":
        return cls(
            id=d["id"],
            url=d["url"],
            caption=d["caption"],
            attrs=dict(d["attrs"]),
            context=[ContentHierarchy.from_dict(c) for c in d["context"]],
            rows=[
                Row(
                    [
                        Cell(
                            is_header=c["is_header"],
                            rowspan=c["rowspan"],
                            colspan=c["colspan"],
                            attrs=dict(c["attrs"]),
                            value=RichText.from_dict(c["value"]),
                        )
                        for c in r["cells"]
                    ],
                    dict(r["attrs"]),
                )
                for r in d["rows"]
            ],
        )

    def to_json(self) -> str:
        import json

        return json.dumps(self.to_dict())

    @classmethod
    def from_json(cls, s: str) -> "Table":
        import json

        return cls.from_dict(json.loads(s))


# -- URL conversion (url_converter.rs:16-53) -------------------------------

_INT_PREFIX = re.compile(r"\d+")


class URLConverter:
    """Relative -> absolute href rewriting, reference-exact.

    Bare relative paths (no leading ``/``, ``//`` or ``.``) are left
    unchanged, matching url_converter.rs:35-37; full RFC 3986 resolution
    is done separately by the crawl canonicalizer (SURVEY.md §2.3).

    Host-relative hrefs rebuild on the *host only* -- the reference uses
    ``url.host_str()`` (url_converter.rs), which drops any port and
    credentials from the doc URL, so ``https://h:8080/x`` + ``/a`` ->
    ``https://h/a``.  Arguably lossy, but reference-exact; the crawl
    canonicalizer keeps non-default ports.
    """

    def __init__(self, base_url: str) -> None:
        self.base_url = base_url
        parts = urlsplit(base_url)
        self.scheme = parts.scheme
        self.host = parts.hostname or ""
        # the reference errors out on an unparseable doc URL
        # (table.rs:169/url_converter.rs:11-14); we degrade to a no-op so
        # one bad row can't fail an Arrow batch
        self.valid = bool(self.scheme and self.host)

    @staticmethod
    def is_absolute(url: str) -> bool:
        return url.startswith("http://") or url.startswith("https://")

    def to_absolute(self, url: str) -> str:
        if url.startswith("//"):
            return f"{self.scheme}:{url}"
        if url.startswith("/"):
            return f"{self.scheme}://{self.host}{url}"
        if url.startswith("."):
            return urljoin(self.base_url, url)
        return url

    def normalize_rich_text(self, rt: RichText) -> None:
        if not self.valid:
            return
        for el in rt.nodes:
            if el.tag == "a":
                href = el.attrs.get("href")
                if href is not None and not self.is_absolute(href):
                    el.attrs["href"] = self.to_absolute(href)


def _parse_span_attr(raw: Optional[str], forgiving: bool) -> int:
    """colspan/rowspan parsing (table.rs:286-307): empty -> 1; forgiving
    mode takes the leading-digit prefix (atoi semantics), else strict."""
    if raw is None:
        return 1
    raw = raw.strip()
    if raw == "":
        return 1
    if forgiving:
        m = _INT_PREFIX.match(raw)
        if not m:
            return 1
        val = int(m.group())
        return val if val <= 0xFFFF else 1  # u16 overflow -> None -> 1
    if not raw.isdigit():
        raise ValueError(f"invalid span value: {raw!r}")
    val = int(raw)
    if val > 0xFFFF:
        raise ValueError(f"span value out of range: {raw!r}")
    return val


class TableExtractor:
    """HTML -> list[Table] (extractors/table.rs:93-325).

    Defaults match table.rs:44-61: discard {script,style,noscript,table},
    ignore {div}, keep {ol,ul,li}, only inline tags tracked.
    """

    def __init__(
        self,
        context_extractor: Optional[ContextExtractor] = None,
        ignored_tags: Optional[set[str]] = None,
        discard_tags: Optional[set[str]] = None,
        keep_tags: Optional[set[str]] = None,
        only_keep_inline_tags: bool = True,
        html_error_forgiveness: bool = True,
        wikipedia_selflink_postprocess: bool = False,
    ) -> None:
        self.ignored_tags = frozenset(
            ignored_tags if ignored_tags is not None else DEFAULT_IGNORED_TAGS
        )
        self.discard_tags = frozenset(
            discard_tags if discard_tags is not None else DEFAULT_DISCARD_TAGS
        )
        self.keep_tags = frozenset(
            keep_tags if keep_tags is not None else DEFAULT_CELL_KEEP_TAGS
        )
        self.only_keep_inline_tags = only_keep_inline_tags
        self.html_error_forgiveness = html_error_forgiveness
        self.wikipedia_selflink_postprocess = wikipedia_selflink_postprocess
        self.context_extractor = context_extractor or ContextExtractor()

    # -- entry points ------------------------------------------------------
    def extract(
        self,
        url: str,
        html: str,
        auto_span: bool = True,
        auto_pad: bool = True,
        extract_context: bool = True,
    ) -> list[Table]:
        doc = parse_document(html)
        return self.extract_tables(url, doc, auto_span, auto_pad, extract_context)

    def extract_tables(
        self,
        url: str,
        doc: Node,
        auto_span: bool = True,
        auto_pad: bool = True,
        extract_context: bool = True,
    ) -> list[Table]:
        # scan: non-nested <table> elements only (table.rs:110-122).
        # one pass: collect every table, then mark each table that has a
        # table ancestor -- the ancestors are the "outer" tables to skip
        # (cheaper than a subtree re-scan per table)
        all_tables = doc.find_all("table")
        table_ids = {id(t) for t in all_tables}
        has_inner: set[int] = set()
        for el in all_tables:
            p = el.parent
            while p is not None:
                if id(p) in table_ids:
                    has_inner.add(id(p))
                    break  # nearer ancestor marked; outer ones get
                    # marked by their own inner tables' walks
                p = p.parent

        tables: list[Table] = []
        table_els: list[Node] = []
        for el in all_tables:
            if id(el) in has_inner:
                continue  # outer table containing tables is skipped
            table = self.extract_non_nested_table(el)
            if not table.rows or all(len(r.cells) == 0 for r in table.rows):
                continue  # drop empty tables (table.rs:116-118)
            tables.append(table)
            table_els.append(el)

        table_nos = list(range(len(tables)))
        if auto_span:
            kept, kept_els, kept_nos = [], [], []
            for i, tbl in enumerate(tables):
                try:
                    kept.append(tbl.span())
                    kept_els.append(table_els[i])
                    kept_nos.append(i)
                except (OverlapSpanError, InvalidCellSpanError):
                    continue  # failed spans are dropped (table.rs:124-148)
            tables, table_els, table_nos = kept, kept_els, kept_nos

        if auto_pad:
            tables = [tbl.pad() or tbl for tbl in tables]

        if extract_context:
            for i, tbl in enumerate(tables):
                tbl.context = self.context_extractor.extract_context(table_els[i])

        # id = url with table_no=<i> appended to the query (table.rs:168-186)
        scheme, netloc, path, query, _frag = urlsplit(url)
        for i, tbl in enumerate(tables):
            q = f"{query}&table_no={table_nos[i]}" if query else f"table_no={table_nos[i]}"
            tbl.id = urlunsplit((scheme, netloc, path, q, ""))
            tbl.url = url

        # Wikipedia selflink anchors point at the page itself (legacy
        # O24, rsoup/python/table_extractor.py:295-306); opt-in flag
        if self.wikipedia_selflink_postprocess:
            for tbl in tables:
                for row in tbl.rows:
                    for cell in row.cells:
                        for el in cell.value.nodes:
                            if (
                                el.tag == "a"
                                and "href" not in el.attrs
                                and "selflink"
                                in el.attrs.get("class", "").split()
                            ):
                                el.attrs["href"] = url

        # absolutize hrefs in every cell and context line (table.rs:188-206)
        conv = URLConverter(url)
        for tbl in tables:
            for row in tbl.rows:
                for cell in row.cells:
                    conv.normalize_rich_text(cell.value)
            for content in tbl.context:
                for line in content.content_before:
                    conv.normalize_rich_text(line)
                for line in content.content_after:
                    conv.normalize_rich_text(line)

        return tables

    # -- single-table extraction (table.rs:216-274) --------------------------
    def extract_non_nested_table(self, table_el: Node) -> Table:
        caption = ""
        rows: list[Row] = []

        def extract_row(row_el: Node) -> None:
            cells = [
                self.extract_cell(cell_el)
                for cell_el in row_el.children
                if cell_el.is_element and cell_el.tag in ("td", "th")
            ]
            rows.append(Row(cells, dict(row_el.attrs)))

        for child in table_el.children:
            if not child.is_element:
                continue
            if child.tag == "caption":
                caption = get_text(child)
                continue
            if child.tag == "tr":
                # html5 parsers insert an implicit <tbody>; our stdlib
                # parser does not, so accept <tr> directly under <table>
                # to reproduce the reference's end-to-end behaviour.
                extract_row(child)
                continue
            if child.tag not in ("thead", "tbody"):
                continue  # style, tfoot etc. skipped (table.rs:232-235)
            for row_el in child.children:
                if row_el.is_element and row_el.tag == "tr":
                    extract_row(row_el)

        return Table(caption=caption, attrs=dict(table_el.attrs), rows=rows)

    def extract_cell(self, cell_el: Node) -> Cell:
        """td/th -> Cell (table.rs:281-325)."""
        return Cell(
            is_header=cell_el.tag == "th",
            rowspan=_parse_span_attr(
                cell_el.attrs.get("rowspan"), self.html_error_forgiveness
            ),
            colspan=_parse_span_attr(
                cell_el.attrs.get("colspan"), self.html_error_forgiveness
            ),
            attrs=dict(cell_el.attrs),
            value=get_rich_text(
                cell_el,
                self.ignored_tags,
                self.only_keep_inline_tags,
                self.discard_tags,
                self.keep_tags,
            ),
        )
