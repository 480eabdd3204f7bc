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
from pyspark.sql.window import Window

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


def ngram_join(toks, n: int, sep: str = " ") -> Column:
    """Sliding word n-grams over a token array as ``sep``-joined
    strings: acc[i] = toks[i] sep toks[i+1] sep ... toks[i+n-1], built
    as a zip_with fold over n-1 shifted slices -- two string concats
    per position.  The transform-over-indices alternative
    (``array_join(slice(toks, i+1, n), sep)`` per position) evaluates
    a non-literal slice in the interpreted expression evaluator once
    per position and measured ~6x slower at bench scale; every
    n-gram-producing operator routes through this fold.  Returns an
    empty array when the token array is shorter than ``n``; callers
    that must distinguish NULL token arrays keep their own
    ``when(size(toks) >= n, ...)`` guard (a NULL array propagates
    through the fold as NULL)."""
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    acc = F.slice(toks, 1, m)
    for j in range(2, n + 1):
        acc = F.zip_with(
            acc,
            F.slice(toks, j, m),
            lambda x, y: F.concat(x, F.lit(sep), y),
        )
    return acc


def collapsed(col) -> Column:
    """Browser-style whitespace collapse of a flat text column."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def doc_fingerprint(col) -> Column:
    """Exact content fingerprint: md5 of the collapsed text.  Used as the
    grouping key for exact dedup; portable (DuckDB md5 matches)."""
    return F.md5(collapsed(col))


# quality is scored over at most this many leading characters.  This
# bounds per-row work at 100TB AND makes the integer arithmetic below
# provably exact: without a cap, num ~ 4e5*n*L overflows int64 around
# L ~ 50MB (silently wrapping in non-ANSI Spark while DuckDB raises,
# so the engines would diverge); at L <= 1e5 the worst case over all
# (n, s, a) consistent with L is num <= 4.25e15, so 2*num+den < 2^53
# and every value below is an exact float64.  The ratios the score
# feeds are stable well before 100KB of text.
QUALITY_MAX_CHARS = 100_000


def quality_score(text_col) -> Column:
    """Heuristic quality score in [0,1]: length band + stopword ratio +
    alpha ratio, computed over the first ``QUALITY_MAX_CHARS`` chars.
    Pure built-ins so it survives 100TB without Python.

    q = 0.4*min(n,100)/100 + 0.3*s/n + 0.3*a/L is a rational of small
    integers, so the 6-dp rounding is done in exact integer arithmetic
    (half-up), never a float round: float evaluation differs between
    engines in the last bit and a score landing ON a rounding boundary
    (0.5046875 happened at sf0.1) flips.  The half-up rounding
    floor((2*num+den) / (2*den)) is computed as (x - x % y) / y: the
    numerator is then an exact integer multiple k*y with k*y < 2^53
    (see QUALITY_MAX_CHARS), and IEEE division of the exact double k*y
    by the exact double y yields exactly k -- no floor-boundary ulp
    hazard, unlike floor(x/y)."""
    head = F.substring(text_col, 1, QUALITY_MAX_CHARS)
    toks = tokens(head)
    n = F.size(toks).cast("long")
    nd = F.greatest(n, F.lit(1))
    m = F.least(n, F.lit(100))
    s = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")
    a = F.length(F.regexp_replace(head, r"[^A-Za-z]", "")).cast("long")
    L = F.greatest(F.length(head).cast("long"), F.lit(1))
    num = 4000 * m * nd * L + 300000 * (s * L + a * nd)
    den = nd * L
    x = 2 * num + den
    y = 2 * den
    return (((x - x % y) / y) / 1000000.0).alias("quality")


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


def detect_lang_expr(text_col) -> Column:
    """Trigram-profile language ID as one JVM expression: argmax of
    ``lang_scores``; ties break to the lexicographically smaller code,
    all-zero scores -> 'und'.  This is the SQL-expressible reference
    construction the DuckDB oracle replays; it evaluates each profile
    gram as its own length/replace pass (~90 full-text scans per doc),
    so the hot path uses the vectorized ``detect_lang`` instead and a
    pytest pins the two equal."""
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    chain = F.when(best <= 0, F.lit("und"))
    for lang in sorted(scores):
        chain = chain.when(scores[lang] == best, F.lit(lang))
    return chain


def detect_lang(text_col) -> Column:
    """Vectorized trigram-profile language ID (one Arrow batch UDF).

    Semantics are identical to ``detect_lang_expr``: per-gram
    NON-overlapping occurrence counts (str.count == the length/replace
    identity, both scan left-to-right), argmax over languages, ties to
    the lexicographically smaller code, all-zero -> 'und'.  One C-level
    substring scan per gram replaces one whole-column Catalyst
    length/replace expression per gram (~40x less plan depth; the
    round-2 bench regression 0.59s -> 3.55s at sf0.1 came from those
    90 expression passes)."""
    from pyspark.sql.functions import pandas_udf

    langs = sorted(LANG_PROFILES)

    @pandas_udf("string")
    def _detect(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)  # null in, null out (as the JVM expr)
                continue
            p = " " + str(t).lower() + " "
            best_lang, best = "und", 0
            for lang in langs:
                sc = sum(p.count(g) for g in LANG_PROFILES[lang])
                if sc > best:
                    best, best_lang = sc, lang
            out.append(best_lang)
        return pd.Series(out)

    return _detect(text_col)


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


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 50,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-token windows -- the
    standard LLM training-data step between cleaning and packing.

    Windows start every ``chunk_tokens - overlap`` tokens; the final
    window may be shorter (never empty).  Empty/whitespace-only text
    follows the ``token_count`` convention (split of '' = ['']) and
    yields one empty chunk, identically in both engines.
    Pure JVM array functions (split / sequence / posexplode /
    slice / array_join): the explode is the only row multiplier and the
    plan stays in whole-stage codegen -- at 100 TB this is a map-only
    stage whose output is ~(1 + overlap/chunk) x input bytes, no
    shuffle at all.
    """
    assert 0 <= overlap < chunk_tokens
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.size(toks).alias("n"),
    ).where(F.col("n") > 0)
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(step))
    return (
        base.select(
            "doc_id", "toks", "n",
            F.posexplode(starts).alias("chunk_id", "start"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.array_join(
                F.slice("toks", F.col("start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.col("n") - F.col("start"))
            .cast("int")
            .alias("n_tokens"),
        )
    )


def densify_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    out_col: str = "dense_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Map arbitrary (e.g. string) ids to dense consecutive longs
    0..n-1 in id sort order -- the ingest step ``pack_chunks`` (which
    needs numeric dense doc ids for its range bucketing) tells
    string-id users to run first.

    Two-level rank, no global single-partition window (the same
    zipWithIndex-shaped machinery pack itself uses): distinct ids are
    range-partitioned on the id, ranked locally per partition, and the
    per-partition counts -- one row per partition, broadcastable by
    construction -- prefix-sum into offsets that shift local ranks to
    global ones.  Range partitioning keeps partitions globally
    ordered, so the result equals the global ORDER BY rank regardless
    of where the sampled boundaries fall.  The mapping joins back on
    the id: one shuffle, no driver data beyond the partition counts.
    """
    ids = df.select(F.col(id_col).alias("__id")).distinct()
    ids = (
        ids.repartitionByRange(n_partitions, "__id")
        if n_partitions
        else ids.repartitionByRange("__id")
    )
    part = ids.withColumn("__p", F.spark_partition_id())
    w_in = Window.partitionBy("__p").orderBy("__id")
    local = part.withColumn("__r", F.row_number().over(w_in) - 1)
    counts = part.groupBy("__p").agg(F.count("*").alias("__c"))
    # one row per partition: the prefix window is single-partition but
    # bounded by the partition count, and the join back is broadcast
    w_b = Window.orderBy("__p").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__p",
        F.coalesce(F.sum("__c").over(w_b), F.lit(0)).alias("__off"),
    )
    mapping = local.join(F.broadcast(offsets), "__p").select(
        "__id",
        (F.col("__r") + F.col("__off")).cast("long").alias(out_col),
    )
    return df.join(
        mapping, F.col(id_col) == F.col("__id")
    ).drop("__id")


# offsets-table bound for pack_chunks: 1e5 rows keep the broadcast at
# ~1.6 MB and the single-partition prefix window sub-millisecond
MAX_PACK_BUCKETS = 100_000


def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int = 512,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
    bucket_docs: int = 64,
    n_docs_hint: int | None = None,
) -> DataFrame:
    """Assign chunks to fixed-budget training sequences (the packing
    step after ``chunk_documents``): contiguous fill in deterministic
    (doc_id, chunk_id) order -- a chunk goes to the pack its cumulative
    starting offset falls in, ``pack_id = (cumsum_before) div budget``.

    The global running sum is computed as a two-level scan so no single
    task ever sees the whole dataset (the zipWithIndex pattern):
    chunks window-cumsum WITHIN deterministic doc-id range buckets
    (``bucket = doc_id div bucket_docs`` -- parallel, partitioned), the
    per-bucket totals prefix-sum in one tiny window over #buckets rows,
    and the bucket offsets broadcast-join back.  Result is identical to
    one global ordered cumsum (the oracle's formulation), but the heavy
    window parallelizes over buckets; pick ``bucket_docs`` so a bucket
    fits one task.  Numeric ``id_col`` required (map string ids with
    ``densify_ids`` first at ingest).

    Packs can overrun the budget by at most one chunk's tokens - 1
    (the standard contiguous-fill bound); exact bin packing is NP-hard
    and needs no place in a 10^9-chunk pipeline.

    Sizing contract: #buckets = max_doc_id / bucket_docs must stay
    small enough for the offsets table to broadcast and for its
    single-partition prefix window to be trivial (<= MAX_PACK_BUCKETS
    ~ 1e5 rows ~ 1.6 MB).  Pass ``n_docs_hint`` (corpus doc count /
    max dense id) and ``bucket_docs`` is raised automatically to honor
    it -- at 10^9 docs the default 64 would otherwise put 1.6e7 rows
    through the driver broadcast.
    """
    if n_docs_hint is not None:
        bucket_docs = max(
            bucket_docs, -(-int(n_docs_hint) // MAX_PACK_BUCKETS)
        )
    bucket = F.floor(F.col(id_col) / bucket_docs).alias("__bucket")
    c = chunks.withColumn("__bucket", bucket)
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(id_col), F.col(chunk_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = c.withColumn(
        "__within", F.coalesce(F.sum(tokens_col).over(w_in), F.lit(0))
    )
    # per-bucket totals: rows = #buckets (bounded small); the prefix
    # window over them is single-partition by construction and cheap
    w_b = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        c.groupBy("__bucket")
        .agg(F.sum(tokens_col).alias("__total"))
        .select(
            "__bucket",
            F.coalesce(F.sum("__total").over(w_b), F.lit(0))
            .alias("__bucket_before"),
        )
    )
    # integer DIV, not float division: (x / b).cast("long") rounds
    # through double and is only exact below ~2**53 cumulative tokens,
    # at odds with the module's integer-exact contract (and the
    # oracle's `//`)
    before = (F.col("__bucket_before") + F.col("__within")).cast("long")
    return (
        c.join(F.broadcast(offsets), "__bucket")
        .withColumn("__before", before)
        .select(
            id_col,
            chunk_col,
            tokens_col,
            F.expr(f"__before DIV {int(budget_tokens)}").alias("pack_id"),
            (F.col("__before") % budget_tokens).cast("int").alias(
                "pack_offset"
            ),
        )
    )


def repetition_stats(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Intra-document repetition (Gopher-style quality signal): the
    fraction of duplicated word n-grams per document, as integers.

    ``rep_ppm = (n_grams - n_distinct) * 10^6 DIV n_grams`` -- integer
    division so the oracle matches exactly at any value (a rounded
    float ratio has half-up ties where representable doubles like
    1/128 differ across engines).

    Scale: map-only JVM array expressions (split -> transform/slice ->
    array_distinct), no shuffle, rides whole-stage codegen; per-row
    cost is O(len); at 100 TB this pipelines with the parquet scan.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.when(
        F.size(toks) >= n, ngram_join(toks, n)
    ).otherwise(F.expr("array()").cast("array<string>"))
    d = docs.withColumn("__grams", grams)
    n_g = F.size("__grams").cast("bigint")
    n_d = F.size(F.array_distinct("__grams")).cast("bigint")
    return d.select(
        id_col,
        n_g.alias("n_grams"),
        n_d.alias("n_distinct"),
        F.when(
            n_g > 0,
            F.expr(
                "(size(__grams) - size(array_distinct(__grams))) "
                "* 1000000L DIV size(__grams)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rep_ppm"),
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with the evaluation set; returns (doc_id,
    n_shared_grams) for contaminated docs only.

    Scale: both sides explode to distinct (doc, gram) / (gram) rows and
    meet in one equi-join on the gram -- the same bucketed posting-list
    shape as the Jaccard dedup, never an all-pairs comparison.  The
    eval side is deduped to one row per gram, so join fan-out is
    bounded by the true overlap; eval sets are small by definition, so
    that side is broadcast-pinned (broadcast-by-construction, not
    by-AQE-statistics) and the training corpus never shuffles: per-doc
    gram dedup happens MAP-SIDE via ``array_distinct`` before the
    explode (round 6; the former ``dropDuplicates([id, gram])``
    shuffled the entire (doc, gram) posting stream for a dedup that is
    doc-local by definition -- guide §2.4).
    """

    def doc_grams(df: DataFrame) -> DataFrame:
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        grams = F.when(
            F.size(toks) >= n, ngram_join(toks, n)
        ).otherwise(F.expr("array()").cast("array<string>"))
        return df.select(
            F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
        )

    eval_grams = doc_grams(eval_docs).select("gram").distinct()
    return (
        doc_grams(train)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_shared_grams"))
    )


# pii patterns deliberately RE2-compatible (no backrefs/lookaround) so
# SQL oracles in other engines can replay them verbatim.  Order
# matters: patterns apply sequentially to the progressively-masked
# text, so the email pattern (whose charset swallows digit runs like
# '555-0123@example.com') must run before the numeric classes, and
# ssn/ipv4 claim their shapes before the looser phone alternation.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    # NANP with separators (optional +1 / 1 prefix, optional area-code
    # parens) or bare E.164 (+ then 8-15 digits)
    ("phone",
     r"(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"
     r"|\+[1-9]\d{7,14}\b",
     "[PHONE]"),
)


def scrub_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple = PII_PATTERNS,
) -> DataFrame:
    """Mask PII spans (emails, SSNs, IPv4s, phone numbers) and report
    per-pattern hit counts: (doc_id, n_<name>..., clean_text).  Pure
    JVM regexp_count/regexp_replace chain -- map-only, codegen, pushes
    the projection into the scan.

    Each pattern's count is computed on the text AFTER all earlier
    patterns masked it, so ``n_<name>`` is exactly the number of
    ``[NAME]`` tokens that pattern contributed to ``clean_text`` --
    overlapping matches (a phone-shaped run inside an email) are
    counted once, by the pattern that actually masked them.
    """
    cols = [F.col(id_col)]
    clean = F.col(text_col)
    for name, pat, repl in patterns:
        cols.append(
            F.regexp_count(clean, F.lit(pat))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, repl)
    cols.append(clean.alias("clean_text"))
    return docs.select(*cols)


# the Gopher rule thresholds (Rae et al. 2021, A1.1 "quality
# filtering"), expressed as exact integer cross-multiplications below
# so no engine ever divides: 0.1 -> c*10 <= n, 90% -> c*10 <= 9*n, ...
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    passthrough: tuple = (),
) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, appendix A1.1) as
    per-document boolean flags plus the underlying counts -- the
    standard web-corpus document filter, complementing the scalar
    ``quality_score``:

      r_word_count   min_words <= words <= max_words
      r_word_len     3 <= mean word length <= 10
      r_symbols      hash and ellipsis each <= 0.1 per word
      r_bullets      <= 90% of lines bullet-started, <= 30%
                     ellipsis-ended
      r_alpha        >= 80% of words contain an alphabetic char
      r_stopwords    >= 2 distinct of the 8 Gopher stop words
      keep           all of the above

    Every ratio test is an integer cross-multiplication (never a
    float division), so the flags replay bit-exactly in an analytic
    SQL oracle and cannot flip on a rounding boundary.  Pure JVM
    expressions end-to-end: one projection, map-only, rides
    whole-stage codegen with the scan at any corpus size.  Tokens are
    ``\\s+`` splits; a corpus with exotic Unicode whitespace should be
    normalized upstream (``collapsed``) first.
    """
    text = F.col(text_col)
    toks = F.filter(tokens(text), lambda t: t != "")
    low = F.transform(toks, F.lower)
    n = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    # non-overlapping occurrence counts via the length/replace
    # identity (same left-to-right semantics in Spark and DuckDB)
    n_hash = (
        F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ).cast("long")
    n_ell = (
        (F.length(text)
         - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
        + F.length(text)
        - F.length(F.replace(text, F.lit("…"), F.lit("")))
    ).cast("long")
    # NB: F.trim must be wrapped -- its optional second parameter
    # makes transform() pass the array index as the trim charset
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("-") | l.startswith("*")
            | l.startswith("•"),
        )
    ).cast("long")
    n_ell_end = F.size(
        F.filter(
            lines,
            lambda l: l.endswith("...") | l.endswith("…"),
        )
    ).cast("long")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("long")
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda w: F.array_contains(low, w),
        )
    ).cast("long")

    r_word_count = (n >= min_words) & (n <= max_words)
    r_word_len = (sum_len >= 3 * n) & (sum_len <= 10 * n)
    r_symbols = (n_hash * 10 <= n) & (n_ell * 10 <= n)
    r_bullets = (n_bullet * 10 <= 9 * n_lines) & (
        n_ell_end * 10 <= 3 * n_lines
    )
    r_alpha = n_alpha * 10 >= 8 * n
    r_stopwords = n_stop >= 2
    return docs.select(
        F.col(id_col),
        *[F.col(p) for p in passthrough],
        n.alias("n_words"),
        n_lines.alias("n_lines"),
        sum_len.alias("sum_word_len"),
        n_hash.alias("n_hash"),
        n_ell.alias("n_ellipsis"),
        n_bullet.alias("n_bullet_lines"),
        n_ell_end.alias("n_ellipsis_lines"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stopwords"),
        r_word_count.alias("r_word_count"),
        r_word_len.alias("r_word_len"),
        r_symbols.alias("r_symbols"),
        r_bullets.alias("r_bullets"),
        r_alpha.alias("r_alpha"),
        r_stopwords.alias("r_stopwords"),
        (
            r_word_count & r_word_len & r_symbols & r_bullets
            & r_alpha & r_stopwords
        ).alias("keep"),
    )


# C4 cleaning heuristics (Raffel et al. 2020, §2.2 "Colossal Clean
# Crawled Corpus").  The policy filter terms are the paper's public
# examples, not a blocklist shipped here.
C4_MIN_LINE_WORDS = 3
C4_MIN_SENTENCES = 5
C4_POLICY_TERMS = ("lorem ipsum", "javascript must be enabled")


def c4_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_sentences: int = C4_MIN_SENTENCES,
) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020, section 2.2) as a
    per-document transform: keep only lines that end in terminal
    punctuation (. ! ? ") and have >= ``min_line_words`` words, then
    flag pages that keep fewer than ``min_sentences`` sentences,
    contain a policy phrase (case-insensitive), or contain a curly
    brace (the paper's code-page tell).  The span-level "three
    sentence dedup" step is ``duplicate_substrings``'s job.

    -> (doc_id, clean_text, n_lines, n_kept, n_sentences, has_policy,
    has_brace, keep); clean_text is the kept lines rejoined with
    newlines, '' when nothing survives.

    Sentences are counted as terminal-punctuation runs inside kept
    lines -- the paper's own heuristic granularity, not a linguistic
    segmenter.  One map-only JVM projection (split / filter /
    array_join / regexp_count), so the filter rides whole-stage
    codegen with the scan; counts are integers and the oracle replays
    them exactly.
    """
    text = F.col(text_col)
    trimmed = F.transform(F.split(text, "\n"), lambda l: F.trim(l))
    raw_lines = F.filter(trimmed, lambda l: l != "")
    kept = F.filter(
        raw_lines,
        lambda l: (
            l.endswith(".") | l.endswith("!") | l.endswith("?")
            | l.endswith('"')
        )
        & (
            F.size(F.filter(F.split(l, r"\s+"), lambda t: t != ""))
            >= min_line_words
        ),
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.when(
        F.size(kept) > 0,
        F.aggregate(
            kept,
            F.lit(0).cast("long"),
            lambda a, l: a
            + F.regexp_count(l, F.lit(r"""[.!?"]+""")).cast("long"),
        ),
    ).otherwise(F.lit(0).cast("long"))
    low = F.lower(text)
    has_policy = F.lit(False)
    for term in C4_POLICY_TERMS:
        has_policy = has_policy | low.contains(term)
    has_brace = low.contains("{") | low.contains("}")
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(raw_lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        n_sent.alias("n_sentences"),
        has_policy.alias("has_policy"),
        has_brace.alias("has_brace"),
        (
            (n_sent >= min_sentences) & ~has_policy & ~has_brace
        ).alias("keep"),
    )


# hashed linear quality classifier (the fastText-style filter used by
# CCNet / DCLM-class pipelines to score documents against a reference
# corpus).  No model file ships here: weights are md5-derived from the
# bucket id, so the operator is a deterministic, engine-portable
# stand-in with the exact production dataflow (hashing-trick features
# -> integer dot product -> threshold); swapping in trained weights is
# a broadcast join on `bucket` against a (bucket, weight) table.
QC_DIM = 4096  # feature buckets; 2^12 keeps the bucket id tiny
QC_WEIGHT_SPAN = 1000  # weights drawn integer-uniform in [-span, span]
QC_MAX_CHARS = 100_000  # same per-doc work/overflow cap as quality_score


def _qc_bucket(tok: Column, dim: int) -> Column:
    """Engine-portable feature bucket: md5('q|' + token) top-60-bit
    int mod dim (the count-min sketch construction, sketch.py:_cell)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("q|"), tok)), 1, 15), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(int(dim)))


def _qc_weight(bucket: Column, span: int) -> Column:
    """Deterministic integer weight for a bucket: md5('w|' + bucket)
    top-60-bit int mod (2*span+1), shifted to [-span, span]."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("w|"), bucket.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(2 * int(span) + 1)) - int(span)


def quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = QC_DIM,
    span: int = QC_WEIGHT_SPAN,
    threshold: int = 0,
) -> DataFrame:
    """Score documents with a hashed linear classifier over unigram +
    adjacent-bigram features (the hashing trick: feature -> md5 bucket
    mod ``dim`` -> integer weight), keep iff ``score >= threshold``.

    This is the corpus-quality *classifier* step of a web-pipeline
    (CCNet / DCLM style), distinct from the rule filters
    (``gopher_rules``, ``c4_filters``): a linear model over sparse
    hashed n-grams.  Everything stays integer (weights are integers,
    the score is their sum), so the decision replays bit-exactly in a
    SQL oracle and can never flip on float rounding.

    Scale shape: map-only.  Features never explode to rows -- the
    token array is transformed and summed in place with JVM array
    expressions (``transform`` + ``aggregate``), so a 100 TB corpus
    pays one projection, no shuffle, no per-token row blowup.  Work
    and the int64 score bound are capped by ``QC_MAX_CHARS``
    (|score| <= 2 * (cap/2 + 1) * span << 2^63).

    Real trained weights drop in by replacing ``_qc_weight`` with a
    broadcast (bucket, weight) lookup -- the feature hashing and the
    aggregation shape are unchanged.

    Tokenization and the feature array are staged in their own
    projections: Catalyst's CollapseProject keeps a non-cheap
    expression that is consumed more than once in its own node rather
    than duplicating it, so each row is split and each feature array
    built exactly once.
    """
    text = F.substring(F.col(text_col), 1, QC_MAX_CHARS)
    staged = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(text), r"\s+"), lambda t: t != ""
        ).alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    featured = staged.select(
        F.col(id_col), F.concat(toks, bigrams).alias("__feats")
    )
    feats = F.col("__feats")
    score = F.aggregate(
        feats,
        F.lit(0).cast("long"),
        lambda acc, t: acc + _qc_weight(_qc_bucket(t, dim), span),
    )
    return featured.select(
        F.col(id_col),
        F.size(feats).cast("long").alias("n_features"),
        score.alias("score"),
        (score >= threshold).alias("keep"),
    )


def corpus_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The standard corpus-cleaning pass end-to-end, as ONE dataflow:
    C4 line cleaning (Raffel et al. 2020 section 2.2) -> Gopher document
    rules over the CLEANED text (Rae et al. 2021 A1.1) -> exact dedup of
    the cleaned text (min-id canonical per fingerprint, survivors of
    the two filters only).

    Running Gopher after C4 and fingerprinting the *cleaned* text is
    the order that matters in production: boilerplate lines a page adds
    around shared content would otherwise defeat exact dedup and skew
    the document statistics.

    Returns every input doc with its fate:
    (doc_id, n_words, keep_c4, keep_gopher, is_canonical, keep) --
    n_words counted on the cleaned text, is_canonical false for any
    doc that failed a filter or lost its fingerprint group.

    Scale shape: the two filter passes are stacked projections on one
    scan (no join -- ``gopher_rules`` carries the C4 outputs through
    via ``passthrough``).  Dedup adds one fingerprint-keyed window over
    only the surviving docs and one id-keyed left join back; both
    exchanges carry (id, flags), never text.
    """
    c4 = c4_filters(docs, id_col, text_col).select(
        F.col(id_col),
        "clean_text",
        F.col("keep").alias("keep_c4"),
    )
    gop = gopher_rules(
        c4, id_col=id_col, text_col="clean_text",
        passthrough=("keep_c4", "clean_text"),
    ).select(
        F.col(id_col),
        "n_words",
        "keep_c4",
        F.col("keep").alias("keep_gopher"),
        doc_fingerprint(F.col("clean_text")).alias("__fp"),
    )
    # gop is read twice (dedup window input + final left side) and is
    # the expensive part -- the full C4 + Gopher text pass.  Its output
    # is narrow (id, count, flags, fingerprint -- no text), so
    # materializing it once is cheap at any scale; without this the
    # planner re-ran the whole text pass per reference.
    gop = gop.localCheckpoint()
    passed = gop.where(F.col("keep_c4") & F.col("keep_gopher"))
    w = Window.partitionBy("__fp").orderBy(id_col)
    canon = (
        passed.withColumn("__rn", F.row_number().over(w))
        .select(F.col(id_col), (F.col("__rn") == 1).alias("is_canonical"))
    )
    return (
        gop.join(canon, id_col, "left")
        .select(
            F.col(id_col),
            "n_words",
            "keep_c4",
            "keep_gopher",
            F.coalesce("is_canonical", F.lit(False)).alias("is_canonical"),
            (
                F.col("keep_c4") & F.col("keep_gopher")
                & F.coalesce("is_canonical", F.lit(False))
            ).alias("keep"),
        )
    )


def lm_surprise(
    docs: DataFrame,
    train_filter: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_millibits: int = 12_000,
) -> DataFrame:
    """Language-model fluency filtering -- the CCNet/DCLM pipeline
    step the hashed classifier does not cover: score every document by
    how surprising its word bigrams are under a bigram LM trained on a
    trusted slice of the same corpus (CCNet trains KenLM on Wikipedia
    and buckets Common Crawl by perplexity; Wenzek et al. 2020 §4.3).
    From-scratch design, integer-exact by construction instead of
    float log-probs:

    per bigram (w1, w2), with add-one smoothing over vocabulary V,
    the model probability is p = (C(w1 w2) + 1) / (C(w1) + V), and
    the *bits of surprise* floor(-log2 p) equals
    floor(log2((C(w1) + V) DIV (C(w1 w2) + 1))) -- exact because
    floor(log2(floor(a/b))) == floor(log2(a/b)) for positive
    integers, and floor(log2 q) is just length(bin(q)) - 1.  Both
    engines evaluate the identical integer pipeline, so the oracle
    matches bit-for-bit with no transcendental in sight; ranking
    fidelity vs true -log2 is within 1 bit per bigram, which is noise
    at corpus-filtering granularity (CCNet itself buckets into
    head/middle/tail thirds).

    Output per document: n_bigrams, total_bits, millibits_per_bigram
    (1000 * total DIV n), keep = millibits <= ``threshold_millibits``.
    Docs with no bigram (< 2 tokens) score NULL and keep = false.

    Scale shape: the classic postings dataflow -- training counts are
    two groupBys with map-side combine (bigram table ~ corpus-unique
    bigrams, the same cardinality class as jaccard_pairs' shingle
    postings); scoring explodes each doc's bigrams map-only, joins
    the two count tables on their keys (AQE broadcasts them when the
    trusted slice is small, shuffle-join at full scale), and
    re-aggregates per doc.  No floats, no UDFs, no collects.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    base = docs.select(
        F.col(id_col), train_filter.alias("__train"), toks.alias("__t")
    )
    bigrams = base.select(
        F.col(id_col),
        "__train",
        F.explode(
            F.zip_with(
                F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                F.slice(F.col("__t"), 2, F.greatest(F.size("__t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select(F.col(id_col), "__train", F.col("bg.w1").alias("w1"),
             F.col("bg.w2").alias("w2"))
    train = bigrams.where(F.col("__train"))
    # (round 6 note: deriving c1 = sum_w2 c2 and the vocab from a
    # persisted c2 -- one training pass instead of three -- measured
    # SLOWER here: the three independent aggregations run as parallel
    # stages of one job, while the derived form serializes them behind
    # the c2 exchange and races its cache fill.  Kept the parallel
    # three-pass form.)
    c2 = train.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c2")
    )
    c1 = train.groupBy("w1").agg(F.count("*").cast("long").alias("c1"))
    vocab = train.select(
        F.explode(F.array("w1", "w2")).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    scored = (
        bigrams.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.expr(
                "length(bin((coalesce(c1, 0) + v) DIV (coalesce(c2, 0) + 1)))"
                " - 1"
            ).cast("long").alias("bits"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("bits").alias("total_bits"),
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "total_bits",
            F.expr("1000 * total_bits DIV n_bigrams").alias(
                "millibits_per_bigram"
            ),
            F.coalesce(
                F.expr("1000 * total_bits DIV n_bigrams")
                <= F.lit(threshold_millibits),
                F.lit(False),
            ).alias("keep"),
        )
    )
