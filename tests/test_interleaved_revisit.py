"""Edge cases for the interleaved span-table operators
(ops/interleaved.py) and the change-rate revisit scheduler
(sources/cdx.py:revisit_schedule) beyond what the gate fixtures reach.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from rsoup_spark.ops.interleaved import media_captions, pack_interleaved
from rsoup_spark.sources.cdx import revisit_schedule

SPAN_SCHEMA = (
    "doc_id LONG, spans ARRAY<STRUCT<kind: STRING, text: STRING, "
    "media_ref: STRING, offset: INT>>"
)


def _caps(spark, rows, **kw):
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = media_captions(df, **kw).collect()
    return {(r["doc_id"], r["media_ref"]):
            (r["caption"], r["caption_offset"], r["caption_side"])
            for r in out}


@pytest.mark.spark
def test_caption_tie_prefers_before(spark):
    got = _caps(spark, [
        (1, [("text", "lead", "", 10), ("img", "", "i1", 30),
             ("text", "trail", "", 50)]),
    ])
    assert got[(1, "i1")] == ("lead", 10, "before")


@pytest.mark.spark
def test_caption_skips_non_text_and_whitespace(spark):
    got = _caps(spark, [
        # heading, anchor, whitespace text, and another img all sit
        # CLOSER than the real text span -- none may caption
        (1, [("h1", "Heading", "", 29), ("a", "link", "/x", 31),
             ("text", "  \t ", "", 30), ("img", "", "other", 28),
             ("img", "", "i1", 30), ("text", "real caption", "", 90)]),
    ])
    assert got[(1, "i1")] == ("real caption", 90, "after")


@pytest.mark.spark
def test_caption_null_when_no_text(spark):
    got = _caps(spark, [
        (1, [("img", "", "i1", 5), ("h1", "only heading", "", 0)]),
    ])
    assert got[(1, "i1")] == (None, None, None)


@pytest.mark.spark
def test_caption_truncates_to_cap(spark):
    long = "x" * 100
    got = _caps(spark, [
        (1, [("text", long, "", 0), ("img", "", "i1", 10)]),
    ], max_caption_chars=16)
    assert got[(1, "i1")] == ("x" * 16, 0, "before")


@pytest.mark.spark
def test_pack_interleaved_costs_and_overflow(spark):
    rows = [
        # 2 words + img(64) = 66 tokens
        (1, [("text", "two words", "", 0), ("img", "", "i", 10)]),
        # 3 words, no image
        (2, [("h1", "a b c", "", 0)]),
        # oversized: 200 words > budget 128
        (3, [("text", " ".join(["w"] * 200), "", 0)]),
        # empty spans: zero-cost doc still packs
        (4, []),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = {r["doc_id"]: r.asDict()
           for r in pack_interleaved(df, budget_tokens=128).collect()}
    assert out[1]["doc_cost"] == 66 and out[1]["n_images"] == 1
    assert out[1]["n_text_tokens"] == 2
    assert out[2]["doc_cost"] == 3 and out[2]["n_images"] == 0
    assert out[3]["packed"] is False and out[3]["pack_id"] is None
    assert out[4]["doc_cost"] == 0 and out[4]["packed"] is True
    # contiguous fill in doc-id order over the fitting docs:
    # doc1 at 0, doc2 at 66, doc4 at 69 -- all in pack 0
    assert (out[1]["pack_id"], out[1]["pack_offset"]) == (0, 0)
    assert (out[2]["pack_id"], out[2]["pack_offset"]) == (0, 66)
    assert (out[4]["pack_id"], out[4]["pack_offset"]) == (0, 69)


@pytest.mark.spark
def test_pack_interleaved_budget_boundary(spark):
    # two 64-cost docs fill pack 0 exactly; the third starts pack 1
    rows = [(i, [("img", "", f"i{i}", 0)]) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = {r["doc_id"]: (r["pack_id"], r["pack_offset"])
           for r in pack_interleaved(df, budget_tokens=128).collect()}
    assert out == {1: (0, 0), 2: (0, 64), 3: (1, 0)}


def _sched(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "url STRING, ts TIMESTAMP, digest STRING"
    )
    return {r["url"]: r.asDict()
            for r in revisit_schedule(df, **kw).collect()}


@pytest.mark.spark
def test_revisit_never_changed_gets_max_interval(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [("u", t0 + datetime.timedelta(days=k), "same")
            for k in range(5)]
    got = _sched(spark, rows, min_days=1, max_days=30)["u"]
    assert got["n_changes"] == 0 and got["interval_days"] == 30
    assert got["next_fetch"] == t0 + datetime.timedelta(days=4 + 30)


@pytest.mark.spark
def test_revisit_single_capture(spark):
    t0 = datetime.datetime(2026, 1, 1)
    got = _sched(spark, [("u", t0, "d0")], max_days=16)["u"]
    assert got["n_caps"] == 1 and got["span_days"] == 0
    assert got["interval_days"] == 16


@pytest.mark.spark
def test_revisit_interval_and_clamps(spark):
    t0 = datetime.datetime(2026, 1, 1)
    # 4 captures over 30 days, digest changes twice -> 30 DIV 2 = 15
    rows = [("mid", t0 + datetime.timedelta(days=d), g)
            for d, g in [(0, "a"), (10, "a"), (20, "b"), (30, "c")]]
    # daily flapper: 3 changes over 3 days -> 1, clamped up to min 2
    rows += [("fast", t0 + datetime.timedelta(days=d), f"g{d}")
             for d in range(4)]
    # one change over 300 days -> clamped down to max 64
    rows += [("slow", t0, "a"), ("slow", t0 + datetime.timedelta(300), "b")]
    got = _sched(spark, rows, min_days=2, max_days=64)
    assert got["mid"]["n_changes"] == 2
    assert got["mid"]["interval_days"] == 15
    assert got["fast"]["interval_days"] == 2
    assert got["slow"]["interval_days"] == 64
    assert got["slow"]["next_fetch"] == (
        t0 + datetime.timedelta(days=300 + 64)
    )


@pytest.mark.spark
def test_linearize_tables_escaping_and_headers(spark):
    """linearize_tables (operators/extract.py): markdown escaping for
    pipes and in-cell newlines, separator only under an all-header
    first row, single-row tables."""
    from rsoup_spark.operators.extract import (
        extract_tables,
        linearize_tables,
    )

    rows = [
        # all-header first row -> separator; pipe + <br> in the value
        ("u1", "<table><tbody><tr><th>h1</th><th>h2</th></tr>"
               "<tr><td>a|b</td><td>line1<br>line2</td></tr>"
               "</tbody></table>"),
        # mixed first row -> NO separator
        ("u2", "<table><tbody><tr><th>h</th><td>v</td></tr>"
               "</tbody></table>"),
    ]
    df = spark.createDataFrame(rows, "url STRING, html STRING")
    out = {r["url"]: r.asDict()
           for r in linearize_tables(extract_tables(df)).collect()}
    u1 = out["u1"]["linearized"]
    assert u1.splitlines() == [
        "| h1 | h2 |",
        "| --- | --- |",
        "| a\\|b | line1 line2 |",
    ]
    assert out["u1"]["n_table_tokens"] == len(u1.split())
    assert out["u2"]["linearized"] == "| h | v |"


@pytest.mark.spark
def test_mix_sources_caps_drops_and_determinism(spark):
    """mix_sources (ops/sampling.py): cap branch keeps everything
    when the target exceeds availability, unlisted sources drop,
    zero-token sources are guarded, and the kept set is invariant
    under repartitioning."""
    from rsoup_spark.ops.sampling import mix_sources

    rows = (
        [(i, "a", "w " * 10) for i in range(10)]        # 100 tokens
        + [(100 + i, "b", "w " * 10) for i in range(10)]  # 100 tokens
        + [(200 + i, "c", "w " * 10) for i in range(10)]  # unlisted
        + [(300, "empty", "")]                            # avail 0
    )
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    kw = dict(
        weights_ppm={"a": 900_000, "b": 100_000, "empty": 100_000},
        budget_tokens=200,
    )
    out = mix_sources(df, **kw).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # a: desired 180 > avail 100 -> cap, keep all 10
    assert len(by_src["a"]) == 10 and by_src["a"][0]["thr"] == 10_000
    # b: desired 20 of 100 -> thr 2000, keeps a strict subset
    assert 0 < len(by_src.get("b", [])) < 10
    assert by_src["b"][0]["thr"] == 2000
    # c unlisted and the zero-token source never appear
    assert "c" not in by_src and "empty" not in by_src
    # determinism: identical kept ids after an adversarial repartition
    again = mix_sources(df.repartition(13), **kw).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in out
    )
