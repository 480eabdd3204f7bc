"""Language-ID and winnowing-fingerprint behavior.

The driver corpus is language-neutral word soup, so real-language
discrimination is pinned here on genuine sentences; the gate query's
exact oracle covers the synthetic corpus.
"""

import pytest

from rsoup_spark.ops.textstats import detect_lang, rolling_fingerprints

SAMPLES = [
    ("en", "The quick brown fox jumps over the lazy dog and then "
           "runs off into the woods while the sun is setting."),
    ("de", "Der schnelle braune Fuchs springt über den faulen Hund "
           "und läuft dann in den Wald, während die Sonne untergeht."),
    ("es", "El rápido zorro marrón salta sobre el perro perezoso y "
           "corre hacia el bosque mientras el sol se pone."),
    ("fr", "Le renard brun rapide saute par-dessus le chien paresseux "
           "et court dans les bois pendant que le soleil se couche."),
    ("zh", "我们在中国的人有很多是这样的，他们都在这里。"),
    ("und", "12345 67890 ##### !!!"),
]


@pytest.mark.spark
def test_detect_lang_real_sentences(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(SAMPLES, "want STRING, text STRING")
    rows = df.select(
        "want", detect_lang(F.col("text")).alias("got")
    ).collect()
    wrong = [(r["want"], r["got"]) for r in rows if r["want"] != r["got"]]
    assert not wrong, wrong


@pytest.mark.spark
def test_winnow_fingerprint_counts(spark):
    """ceil((n_tokens - window + 1) / keep_every) fingerprints per doc
    with >= window tokens; exactly one for shorter docs; deterministic."""
    import math

    docs = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(20))),
         (2, "only three tokens"),
         (3, " ".join(f"w{i % 5}" for i in range(9)))],
        "doc_id LONG, text STRING",
    )
    out = rolling_fingerprints(docs, window=8, keep_every=4)
    counts = {r["doc_id"]: r["n"] for r in
              out.groupBy("doc_id").count().withColumnRenamed(
                  "count", "n").collect()}
    assert counts == {
        1: math.ceil((20 - 8 + 1) / 4),
        2: 1,
        3: math.ceil((9 - 8 + 1) / 4),
    }
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, rolling_fingerprints(
        docs, window=8, keep_every=4).collect()))
    assert a == b
