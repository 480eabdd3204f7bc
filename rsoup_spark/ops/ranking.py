"""Corpus relevance ranking (BM25) in exact integer arithmetic.

Float BM25 is order-dependent and engine-dependent at the ULP level;
this implementation keeps every intermediate an integer (parts-per-
million scaling, truncating division) so two engines computing it --
Spark here, the DuckDB oracle in ``__spark_entry__`` -- agree bit-for-
bit.  Same discipline as ``textstats.repetition_stats`` and the
integer-exact PageRank.

With k1 = 1.2 and b = 0.75 the classic per-term saturation
    tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)
multiplied through by 20*avgdl clears every fraction:
    s_ppm = tf*44*avgdl*1_000_000 DIV (20*tf*avgdl + 6*avgdl + 18*dl)
and the log-free rational IDF surrogate
    idf_x1e6 = (2*(N-df)+1)*1_000_000 DIV (2*df+1)   (capped at 1e12)
is the BM25+ ratio without the ln -- monotone in df, which is all
ranking needs.  The cap bounds the product below 2^63 at any corpus
size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDF_CAP = 10**12


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Corpus inverted index: one row per surviving term with
    ``(term, df, total_tf, postings)`` where ``postings`` is the
    doc-id-sorted ``"doc:tf,doc:tf,..."`` posting list.

    This is the corpus-sized complement to :func:`bm25_topk` (whose
    map-side form is for query-sized term sets): explode to term
    postings, aggregate twice.  Scale shape: the explode is map-only
    and rides the scan; shuffle #1 keys on (term, doc) with map-side
    partial counts; shuffle #2 keys on term and materializes each
    posting list with ``sort_array(collect_list(struct))`` -- sorted
    deterministically, encoded as a string so the layout is
    engine-portable.  ``max_df`` is the same stop-term guard as
    ``jaccard_pairs``' df cap: a term appearing in half the corpus
    produces a posting list the size of the corpus, which is a skewed
    reduce key AND a useless retrieval term -- cap it.  Per-term
    output rows are bounded by max_df, so no reduce key exceeds that
    many collected structs.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    per_doc = (
        docs.select(F.col(id_col).alias("doc"), F.explode(toks).alias("term"))
        .groupBy("term", "doc")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    grouped = per_doc.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("doc", "tf"))),
                lambda s: F.concat_ws(":", s["doc"], s["tf"]),
            ),
            ",",
        ).alias("postings"),
    )
    out = grouped.where(F.col("df") >= int(min_df))
    if max_df is not None:
        out = out.where(F.col("df") <= int(max_df))
    return out


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by integer BM25 against a small query-term set:
    ``(id_col, score_ppm)``, score descending, id ascending on ties;
    only documents containing at least one query term rank.

    Scale shape: for a query-sized term set (the point-lookup use
    case; one output column per term) everything is computed WITHOUT a
    posting explode.  Per-term tf is a map-side array expression over
    the token array, so the plan is two corpus scans -- one scoring
    pass that Catalyst filters to hit documents at the scan, and one
    unavoidable full pass for the global stats (n_docs, avgdl, df must
    see every document) that reduces map-side to a one-row broadcast.
    The only other shuffle is the final top-k, which Spark executes as
    TakeOrderedAndProject (per-partition heads, no global sort
    materialization).  A naive postings formulation costs three corpus
    scans (tf, df, corpus stats) plus a posting shuffle; the map-side
    form is the one you want at any scale.  Nothing leaves the JVM.
    For corpus-sized term sets
    (building a full index, not answering a query), explode to
    postings instead -- column count is the bound here.
    """
    terms = list(terms)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")

    def _count_of(term: str):
        # nb: the lambda must stay single-parameter -- a second
        # (default) parameter makes pyspark bind it as the array index
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))

    tf_cols = [
        _count_of(t).cast("bigint").alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    base = docs.select(F.col(id_col), toks.alias("toks")).select(
        id_col,
        F.size("toks").cast("bigint").alias("dl"),
        *tf_cols,
    )

    stats = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.greatest(
            F.expr("sum(dl) DIV count(*)"), F.lit(1).cast("bigint")
        ).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )

    def contrib(i: int):
        tf, df = f"tf_{i}", f"df_{i}"
        s_ppm = (
            f"({tf} * 44 * avgdl * 1000000)"
            f" DIV (20 * {tf} * avgdl + 6 * avgdl + 18 * dl)"
        )
        idf = (
            f"least(((2 * (n_docs - {df}) + 1) * 1000000)"
            f" DIV (2 * {df} + 1), {IDF_CAP})"
        )
        return F.when(
            F.col(tf) > 0, F.expr(f"({s_ppm}) * ({idf}) DIV 1000000")
        ).otherwise(F.lit(0).cast("bigint"))

    score = sum(
        (contrib(i) for i in range(len(terms))), F.lit(0).cast("bigint")
    )
    n_hits = sum(
        (F.col(f"tf_{i}") for i in range(len(terms))),
        F.lit(0).cast("bigint"),
    )
    return (
        base.crossJoin(F.broadcast(stats))
        .where(n_hits > 0)
        .select(id_col, score.cast("bigint").alias("score_ppm"))
        .orderBy(F.desc("score_ppm"), F.asc(id_col))
        .limit(k)
    )
