"""Operators over the interleaved text+media span table.

The engine's canonical document shape (BASELINE input_hint) is
``(doc_id, spans: array<struct<kind, text, media_ref, offset>>)`` --
rsoup's RichText span stream with media references inline
(models/rich_text/mod.rs span elements; the img/a spans
``extract_spans`` emits).  These operators consume that table the way
a multimodal training pipeline does:

* ``media_captions`` -- harvest (image, caption) pairs: for every img
  span, the nearest non-empty text span by character offset (the
  LAION-style alt-text/caption mining step, reduced to its
  deterministic core: proximity in the SAME interleaved stream).
* ``pack_interleaved`` -- cost-aware sequence packing where media
  spans carry a fixed token cost (vision-token budget per image, the
  LLaVA/Fuyu-style accounting) and text spans cost their whitespace
  token count; whole documents pack contiguously into fixed budgets
  via the same two-level scan ``pack_chunks`` uses, oversized docs
  flag instead of silently splitting a cross-modal context.

Scale shape: ``media_captions`` is map-only -- the candidate scan is
an array transform + array_min per img span (JVM, codegen), one
explode, no shuffle, no UDF.  ``pack_interleaved`` is one map-only
array aggregate per doc followed by ``pack_chunks``'s bounded
two-level scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsoup_spark.ops.textstats import pack_chunks

IMAGE_TOKENS = 64  # default vision-token budget charged per img span


def _word_count(text: Column) -> Column:
    return F.size(
        F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")
    )


def media_captions(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    max_caption_chars: int = 64,
) -> DataFrame:
    """One row per img span: the nearest non-empty ``text`` span in
    the same document by absolute offset distance, ties preferring
    the span BEFORE the image (captions lead more often than trail),
    then the lower offset.  Only ``kind = 'text'`` spans with
    non-whitespace text are candidates (headings, anchors, and other
    imgs are not captions).  Images in documents with no candidate
    text get caption NULL -- they still surface, because a
    caption-coverage ratio is itself a corpus-quality signal.

    Entirely JVM array expressions: candidates = transform(texts,
    struct(dist, after, offset, snippet)); array_min's lexicographic
    struct ordering IS the tie-break rule.  Map-only; the only row
    expansion is the img explode.
    """
    spans = F.col(spans_col)
    # rlike(\S), not trim() != '': Spark trim strips only 0x20 spaces,
    # and a tab-only span must not caption
    texts = F.filter(
        spans,
        lambda s: (s["kind"] == "text") & s["text"].rlike(r"\S"),
    )
    imgs = F.filter(spans, lambda s: s["kind"] == "img")
    base = docs.select(
        F.col(id_col),
        texts.alias("__texts"),
        F.explode(imgs).alias("__img"),
    )
    o = F.col("__img.offset")
    cands = F.transform(
        F.col("__texts"),
        lambda t: F.struct(
            F.abs(t["offset"] - o).alias("d"),
            F.when(t["offset"] > o, F.lit(1)).otherwise(F.lit(0)).alias(
                "after"
            ),
            t["offset"].alias("toff"),
            F.substring(t["text"], 1, max_caption_chars).alias("cap"),
        ),
    )
    best = F.array_min(cands)
    return base.select(
        F.col(id_col),
        F.col("__img.media_ref").alias("media_ref"),
        o.alias("img_offset"),
        best["cap"].alias("caption"),
        best["toff"].alias("caption_offset"),
        F.when(best["after"] == 1, F.lit("after"))
        .when(best["after"] == 0, F.lit("before"))
        .alias("caption_side"),
    )


def pack_interleaved(
    docs: DataFrame,
    budget_tokens: int = 2048,
    image_tokens: int = IMAGE_TOKENS,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    bucket_docs: int = 64,
    n_docs_hint: int | None = None,
) -> DataFrame:
    """Pack whole interleaved documents into fixed-budget training
    sequences: every img span costs ``image_tokens`` (the fixed
    vision-encoder output length), every other span costs its
    whitespace token count; a document's spans stay together (images
    are meaningless cut off from their surrounding text), so packing
    is at document granularity -- contiguous fill in doc-id order via
    ``pack_chunks``'s two-level scan, documents over the budget flag
    ``packed = false`` with NULL pack assignment instead of being
    split or silently dropped.

    Output: (id, doc_cost, n_images, n_text_tokens, pack_id,
    pack_offset, packed).
    """
    spans = F.col(spans_col)
    cost = F.aggregate(
        spans,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(s["kind"] == "img", F.lit(int(image_tokens)))
        .otherwise(_word_count(s["text"]))
        .cast("long"),
    )
    n_images = F.size(F.filter(spans, lambda s: s["kind"] == "img"))
    costed = docs.select(
        F.col(id_col),
        cost.alias("doc_cost"),
        n_images.cast("long").alias("n_images"),
        (cost - n_images * image_tokens).alias("n_text_tokens"),
    )
    fits = costed.where(F.col("doc_cost") <= budget_tokens)
    packed = pack_chunks(
        fits.select(
            F.col(id_col),
            F.lit(0).alias("chunk_id"),
            F.col("doc_cost").alias("n_tokens"),
        ),
        budget_tokens=budget_tokens,
        id_col=id_col,
        bucket_docs=bucket_docs,
        n_docs_hint=n_docs_hint,
    ).select(
        F.col(id_col),
        "pack_id",
        "pack_offset",
    )
    return (
        costed.join(packed, id_col, "left")
        .select(
            F.col(id_col),
            "doc_cost",
            "n_images",
            "n_text_tokens",
            "pack_id",
            "pack_offset",
            F.col("pack_id").isNotNull().alias("packed"),
        )
    )
