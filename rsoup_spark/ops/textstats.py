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

# character n-gram profiles per language: the highest-frequency
# distinctive trigrams (with word-boundary spaces) drawn from public
# frequency tables for each language; single high-frequency hanzi for
# zh.  Stored in-repo -- deterministic, no external models.  The score
# of a language is the total occurrence count of its profile n-grams in
# the space-padded lowercased text; argmax predicts, ties break to the
# lexicographically smaller code, all-zero scores predict 'und'.
LANG_PROFILES = {
    "en": (" th", "the", "he ", " an", "and", "nd ", "ing", "ng ",
           " of", "of ", " to", "to ", "ion", " is", "is ", "tio",
           " in", "in ", "hat", " wh"),
    "de": (" de", "der", "ie ", "die", "und", " un", "sch", "ich",
           "ein", " ei", "cht", "ung", "gen", " ge", "ber", "ten",
           " zu", "das", "ver", "nen"),
    "es": (" de", "de ", " la", "la ", "os ", " el", "el ", "ión",
           "ció", " co", " es", "ado", " en", "que", " qu", "ue ",
           "ara", " pa", "nte", "ien"),
    "fr": (" de", "de ", " le", "le ", "es ", " la", "la ", "ion",
           " et", "et ", "que", " qu", "ue ", " pa", "ais", "our",
           " po", "eur", "ant", "les"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "人", "这", "中"),
}

STOPWORDS = ("the", "a", "of", "to", "and", "is", "in", "it")


def tokens(col) -> Column:
    """Whitespace tokenization, codegen-friendly."""
    return F.split(F.trim(col), r"\s+")


def token_count(col) -> Column:
    return F.size(tokens(col))


# BPE-style pretokenization (GPT-2-ish word/number/punct split), kept to
# ASCII classes so the Java and DuckDB regex engines agree exactly
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(col) -> Column:
    """Tokens under a BPE-ish pretokenizer regex: letter runs, digit
    runs, and individual punctuation -- the unit LLM token budgeting
    actually counts (whitespace token_count undercounts punct-heavy
    text).  JVM regexp_extract_all, oracle-mirrored."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def collapsed(col) -> Column:
    """Browser-style whitespace collapse of a flat text column."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def doc_fingerprint(col) -> Column:
    """Exact content fingerprint: md5 of the collapsed text.  Used as the
    grouping key for exact dedup; portable (DuckDB md5 matches)."""
    return F.md5(collapsed(col))


def quality_score(text_col) -> Column:
    """Heuristic quality score in [0,1]: length band + stopword ratio +
    alpha ratio.  Pure built-ins so it survives 100TB without Python.

    q = 0.4*min(n,100)/100 + 0.3*s/n + 0.3*a/L is a rational of small
    integers, so the 6-dp rounding is done in exact integer arithmetic
    (half-up): float evaluation differs between engines in the last bit
    and a score landing ON the boundary (0.5046875 happened at sf0.1)
    rounds differently.  floor((2*num+den)/(2*den)) in float64 is exact
    here: the quotient is >= 1/(2*den) ~ 2.5e-7 away from any other
    integer, far beyond double ulp at 1e6."""
    toks = tokens(text_col)
    n = F.size(toks).cast("long")
    nd = F.greatest(n, F.lit(1))
    m = F.least(n, F.lit(100))
    s = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")
    a = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", "")).cast("long")
    L = F.greatest(F.length(text_col).cast("long"), F.lit(1))
    num = 4000 * m * nd * L + 300000 * (s * L + a * nd)
    den = nd * L
    return (F.floor((2 * num + den) / (2 * den)) / 1000000.0).alias(
        "quality"
    )


def lang_scores(text_col) -> dict[str, Column]:
    """Per-language trigram-profile scores as JVM expressions.

    Occurrence counting via the length/replace identity
    (len(s) - len(replace(s, g, ''))) / len(g) -- non-overlapping
    occurrences, identical semantics in Spark and DuckDB, whole-stage
    codegen (no Python in the hot path)."""
    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    out: dict[str, Column] = {}
    for lang in sorted(LANG_PROFILES):
        terms = [
            (F.length(padded) - F.length(F.replace(padded, F.lit(g))))
            / F.lit(len(g))
            for g in LANG_PROFILES[lang]
        ]
        score = terms[0]
        for t in terms[1:]:
            score = score + t
        out[lang] = score
    return out


def detect_lang(text_col) -> Column:
    """Trigram-profile language ID as one JVM expression: argmax of
    ``lang_scores``; ties break to the lexicographically smaller code,
    all-zero scores -> 'und'.  SQL-expressible, so the lang_id gate
    query has an exact DuckDB oracle."""
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    chain = F.when(best <= 0, F.lit("und"))
    for lang in sorted(scores):
        chain = chain.when(scores[lang] == best, F.lit(lang))
    return chain


def rolling_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    window: int = 8, keep_every: int = 4,
) -> DataFrame:
    """Winnowing-style rolling-hash fingerprints (the standard
    MOSS/winnowing construction): polynomial rolling hash over
    ``window``-token shingles, keeping the minimum hash of every
    ``keep_every`` consecutive window.  mapInPandas; deterministic.

    The token hash is the top 60 bits of md5 (portable: md5 exists in
    every engine, so the whole construction is expressible in ANSI SQL
    for the oracle), folded with acc = (acc*BASE + h) mod (2^61 - 1).
    """
    import hashlib

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
                    fps.append(_poly(hs, MOD, BASE) if hs else 0)
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
        # first 15 hex digits of md5 = 60 bits, fits signed int64
        return int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)

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
