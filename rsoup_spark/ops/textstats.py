"""Text-analysis operators over a documents table.

All hot-path expressions are JVM-side built-ins (whole-stage codegen);
only language-ID's trigram scoring drops to a vectorized pandas UDF.
Columns are aliased to stable names so DuckDB oracles can mirror them.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# tiny function-word profiles for the n-gram/marker language heuristic;
# deterministic and self-contained (no external models)
_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " to ", " is "),
    "de": (" der ", " die ", " und ", " das ", " ist "),
    "es": (" el ", " la ", " de ", " que ", " es "),
    "fr": (" le ", " la ", " et ", " les ", " est "),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS = ("the", "a", "of", "to", "and", "is", "in", "it")


def tokens(col) -> Column:
    """Whitespace tokenization, codegen-friendly."""
    return F.split(F.trim(col), r"\s+")


def token_count(col) -> Column:
    return F.size(tokens(col))


def collapsed(col) -> Column:
    """Browser-style whitespace collapse of a flat text column."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def doc_fingerprint(col) -> Column:
    """Exact content fingerprint: md5 of the collapsed text.  Used as the
    grouping key for exact dedup; portable (DuckDB md5 matches)."""
    return F.md5(collapsed(col))


def quality_score(text_col) -> Column:
    """Heuristic quality score in [0,1]: length band + stopword ratio +
    alpha ratio.  Pure built-ins so it survives 100TB without Python."""
    toks = tokens(text_col)
    n = F.size(toks)
    stop_ratio = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ) / F.greatest(n, F.lit(1))
    alpha_ratio = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", "")) / \
        F.greatest(F.length(text_col), F.lit(1))
    len_band = F.least(n / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.4 * len_band + 0.3 * stop_ratio + 0.3 * alpha_ratio, 6
    )


@F.pandas_udf(StringType())
def detect_lang(texts: pd.Series) -> pd.Series:
    """Marker-token language heuristic, vectorized per Arrow batch.

    Scores each language by marker hit counts in the padded text; ties
    break lexicographically for determinism.  Non-SQL-expressible ->
    rows-only correctness check (driver contract).
    """

    def _one(t: str) -> str:
        padded = f" {t.lower()} "
        best_lang, best = "und", 0
        for lang in sorted(_LANG_MARKERS):
            score = sum(padded.count(m) for m in _LANG_MARKERS[lang])
            if score > best:
                best_lang, best = lang, score
        return best_lang

    return texts.map(_one)


def rolling_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    window: int = 8, keep_every: int = 4,
) -> DataFrame:
    """Winnowing-style rolling-hash fingerprints (docstring cites the
    standard MOSS/winnowing construction): polynomial rolling hash over
    ``window``-token shingles, keeping the minimum hash of every
    ``keep_every`` consecutive window.  mapInPandas; deterministic."""
    import numpy as np

    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = str(text).split()
                hs = [hash_token(t) for t in toks]
                if len(hs) < window:
                    ids.append(did)
                    fps.append(
                        int(np.int64(_poly(hs, MOD, BASE))) if hs else 0
                    )
                    continue
                windows = [
                    _poly(hs[i : i + window], MOD, BASE)
                    for i in range(len(hs) - window + 1)
                ]
                for j in range(0, len(windows), keep_every):
                    ids.append(did)
                    fps.append(min(windows[j : j + keep_every]))
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    def hash_token(t: str) -> int:
        h = 1469598103934665603  # FNV-1a 64 offset basis (public constant)
        for ch in t.encode("utf-8"):
            h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        return h

    def _poly(hs: list[int], mod: int, base: int) -> int:
        acc = 0
        for h in hs:
            acc = (acc * base + h) % mod
        return acc

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType, True),
            StructField("fingerprint", LongType(), True),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(run, schema)
