"""Incremental MinHash-LSH (ops/dedup.py:minhash_lsh_incremental):
batch-vs-index equivalence with the batch operator, no history-history
emission, and the hot-bucket star cap on a degenerate increment.
"""

import pytest
from pyspark.sql import functions as F

from rsoup_spark.ops.dedup import (
    minhash_lsh_incremental,
    minhash_lsh_pairs,
    minhash_signatures,
)


def _corpus(spark):
    """Planted near-dups straddling the even(index)/odd(batch) split:
    0~1 (index-batch), 1~3 (batch-batch), 4~6 (index-index: must NOT
    re-emit), and unrelated fillers."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base + " lambda mu"),
        (1, base + " lambda nu"),          # ~ 0 and ~ 3
        (3, base + " lambda nu xi"),       # ~ 1
        (4, "one two three four five six seven eight nine ten eleven"),
        (6, "one two three four five six seven eight nine ten twelve"),
        (5, "completely different text with no overlap at all here ok"),
        (8, "another unrelated document about entirely other things yes"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


@pytest.mark.spark
def test_incremental_equals_batch_restricted(spark):
    docs = _corpus(spark)
    new = docs.where(F.col("doc_id") % 2 == 1)
    idx = minhash_signatures(docs.where(F.col("doc_id") % 2 == 0))

    inc = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in minhash_lsh_incremental(new, idx, threshold=0.5).collect()
    }
    batch = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
        if r["id_b"] % 2 == 1
    }
    assert inc == batch
    assert inc, "fixture must actually produce batch-side pairs"
    # id_b is always in the new batch; history-history never emits
    assert all(b % 2 == 1 for _a, b in inc)
    assert (4, 6) not in inc


@pytest.mark.spark
def test_jaccard_verify_needs_corpus(spark):
    docs = _corpus(spark)
    new = docs.where(F.col("doc_id") % 2 == 1)
    idx = minhash_signatures(docs.where(F.col("doc_id") % 2 == 0))
    with pytest.raises(ValueError, match="corpus_docs"):
        minhash_lsh_incremental(new, idx, verify="jaccard").collect()
    got = minhash_lsh_incremental(
        new, idx, corpus_docs=docs, verify="jaccard", threshold=0.5
    ).collect()
    # 0~1 share all but the last word; 0~3 still overlap at 9/12
    # trigrams (0.75); 1~3 at 10/11
    assert {(r["id_a"], r["id_b"]) for r in got} == {(0, 1), (0, 3), (1, 3)}


@pytest.mark.spark
def test_hot_bucket_star_cap_on_increment(spark):
    """A degenerate increment (every doc identical) against identical
    history must stay linear: with the cap, candidates are the star on
    the bucket's min id, and every NEW doc is still attached."""
    text = "same words repeated here for every single document body"
    rows = [(i, text) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    new = docs.where(F.col("doc_id") % 2 == 1)
    idx = minhash_signatures(docs.where(F.col("doc_id") % 2 == 0))
    got = minhash_lsh_incremental(
        new, idx, threshold=0.5, max_bucket_size=5
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    # star: every pair anchors on the global min id (0, in history)
    assert pairs == {(0, b) for b in range(1, 40, 2)}
