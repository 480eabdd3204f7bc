"""Property-based invariants for span()/pad()/rich-text round trips."""

from hypothesis import given, settings
from hypothesis import strategies as st

from rsoup_spark.functions.table import (
    Cell,
    InvalidCellSpanError,
    OverlapSpanError,
    Row,
    Table,
)
from rsoup_spark.functions.text import RichText

cells = st.builds(
    lambda t, rs, cs, h: Cell(
        is_header=h, rowspan=rs, colspan=cs, value=RichText.from_str(t)
    ),
    st.text(alphabet="abcxyz ", min_size=0, max_size=6),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=4),
    st.booleans(),
)
tables = st.builds(
    lambda rows: Table(rows=[Row(list(r)) for r in rows]),
    st.lists(st.lists(cells, min_size=1, max_size=5), min_size=1, max_size=5),
)


@given(tables)
@settings(max_examples=200, deadline=None)
def test_span_invariants(t):
    """span() either raises the two documented errors or yields a grid
    where every cell has rowspan=colspan=1 and no row exceeds the
    computed max width; spanning never invents text."""
    try:
        s = t.span()
    except (OverlapSpanError, InvalidCellSpanError):
        return
    widths = [len(r.cells) for r in s.rows]
    assert len(s.rows) == len(t.rows)
    assert all(
        c.rowspan == 1 and c.colspan == 1 for r in s.rows for c in r.cells
    )
    in_texts = {c.value.text for r in t.rows for c in r.cells}
    assert {c.value.text for r in s.rows for c in r.cells} <= in_texts
    assert max(widths) <= max(
        len(r.cells) + sum(c.colspan - 1 for c in r.cells) for r in t.rows
    ) + sum(c.rowspan - 1 for r in t.rows for c in r.cells)


@given(tables)
@settings(max_examples=200, deadline=None)
def test_pad_makes_regular(t):
    p = t.pad()
    if p is None:
        widths = {len(r.cells) for r in t.rows}
        assert len(widths) == 1 or not t.rows
        return
    widths = {len(r.cells) for r in p.rows}
    assert len(widths) == 1
    assert max(len(r.cells) for r in t.rows) == widths.pop()
    # padding preserves original cells in place
    for orig, padded in zip(t.rows, p.rows):
        assert padded.cells[: len(orig.cells)] == orig.cells


@given(tables)
@settings(max_examples=100, deadline=None)
def test_span_then_pad_idempotent_shape(t):
    try:
        s = t.span()
    except (OverlapSpanError, InvalidCellSpanError):
        return
    padded = s.pad() or s
    # a spanned+padded table is regular; dict round-trip is lossless
    assert len({len(r.cells) for r in padded.rows}) <= 1
    assert Table.from_dict(padded.to_dict()).to_dict() == padded.to_dict()


def test_extractor_never_crashes_on_tag_soup():
    """TableExtractor over random malformed soup: any outcome is fine
    except an unhandled exception (overlap-dropped tables, empty
    results, weird cells are all legal)."""
    import random

    from rsoup_spark.functions.table import TableExtractor

    V = ["<table>", "<tr>", "<td>", "<th>", "<tbody>", "<thead>",
         "<colgroup>", "<col>", "<caption>", "<tfoot>",
         "<td colspan=2>", "<td rowspan=3>", "<td colspan=99999999999>",
         "<td colspan=0>", "<td rowspan='-1'>", "<table><td>nested",
         "</table>", "</tr>", "</td>", "</th>", "</tbody>", "</>",
         "<b>", "</b>", "<i>", "</i>", "<a href='/x'>", "</a>",
         "<img src=/i.png>", "<br/>", "x", " ", "émoji 🎉", "&amp;",
         "<", ">", '"', "</ td>", "</y=z>", "<p>", "</p>", "<div>",
         "</div>"]
    ex = TableExtractor()
    rng = random.Random(0xBEEF)
    n_tables = 0
    for case in range(300):
        soup = "".join(
            rng.choice(V) for _ in range(rng.randint(5, 60))
        )
        html = f"<html><body><h1>t</h1>{soup}</body></html>"
        tables = ex.extract("https://fuzz.test/page", html)
        n_tables += len(tables)
        for t in tables:
            rows, cols = t.shape()
            assert rows >= 0 and cols >= 0
            grid = t.to_list()
            assert len(grid) == rows
            assert all(len(r) == cols for r in grid)
    assert n_tables > 0  # the soup does produce some extractable tables
