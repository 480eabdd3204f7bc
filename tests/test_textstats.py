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
def test_detect_lang_udf_matches_expression(spark):
    """The vectorized UDF must agree with the SQL-expressible JVM
    reference construction (which the DuckDB oracle replays) on both
    the synthetic corpus and real multilingual sentences."""
    from pyspark.sql import functions as F

    from rsoup_spark.ops.textstats import detect_lang_expr
    from rsoup_spark.sources.docs import load_table

    real = spark.createDataFrame(SAMPLES, "want STRING, text STRING")
    corpus = load_table(spark, "/root/testdata/sf0.001", "documents")
    for df in (real, corpus.select("text")):
        diff = (
            df.select(
                detect_lang(F.col("text")).alias("udf"),
                detect_lang_expr(F.col("text")).alias("expr"),
            )
            .where(F.col("udf") != F.col("expr"))
            .count()
        )
        assert diff == 0


@pytest.mark.spark
def test_quality_score_huge_doc_no_overflow(spark):
    """Multi-MB documents must not overflow the exact integer scoring
    (pre-cap, num ~ 4e5*n*L wrapped int64 silently in non-ANSI Spark);
    the capped score equals the score of the head and stays in [0,1]."""
    from pyspark.sql import functions as F

    from rsoup_spark.ops.textstats import QUALITY_MAX_CHARS, quality_score

    big = ("the quick brown fox " * 300_000)  # 6M chars, 1.2M tokens
    df = spark.createDataFrame(
        [(1, big), (2, big[:QUALITY_MAX_CHARS])], "doc_id LONG, text STRING"
    )
    rows = {r["doc_id"]: r["q"] for r in df.select(
        "doc_id", quality_score(F.col("text")).alias("q")).collect()}
    assert rows[1] == rows[2], rows
    assert 0.0 <= rows[1] <= 1.0


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


@pytest.mark.spark
def test_chunk_documents_invariants(spark):
    """Window algebra: chunk 0 starts the doc, consecutive chunks
    overlap by exactly `overlap` tokens, and the non-overlap prefixes
    concatenated reproduce the whitespace-normalized token stream."""
    from rsoup_spark.ops.textstats import chunk_documents

    text = " ".join(f"t{i}" for i in range(137))
    df = spark.createDataFrame(
        [(1, text), (2, "solo"), (3, " ".join(f"x{i}" for i in range(50)))],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=50, overlap=10)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
         for r in out.collect())
    )
    by_doc: dict = {}
    for d, c, t, n in rows:
        by_doc.setdefault(d, []).append((c, t.split(" "), n))
    # 137 tokens, step 40 -> starts 0,40,80,120 -> 4 chunks
    assert [c for c, _t, _n in by_doc[1]] == [0, 1, 2, 3]
    assert [n for _c, _t, n in by_doc[1]] == [50, 50, 50, 17]
    toks = text.split(" ")
    for c, chunk_toks, n in by_doc[1]:
        assert chunk_toks == toks[c * 40 : c * 40 + 50]
        assert len(chunk_toks) == n
    # overlap region shared verbatim between consecutive chunks
    assert by_doc[1][0][1][-10:] == by_doc[1][1][1][:10]
    # single-token and exactly-chunk-sized docs: one / two chunks
    assert [n for _c, _t, n in by_doc[2]] == [1]
    assert [n for _c, _t, n in by_doc[3]] == [50, 10]
    # reconstruction: non-overlap prefixes + final chunk == token stream
    recon = []
    chunks1 = by_doc[1]
    for c, chunk_toks, _n in chunks1[:-1]:
        recon.extend(chunk_toks[:40])
    recon.extend(chunks1[-1][1])
    assert recon == toks


@pytest.mark.spark
def test_pack_chunks_invariants(spark):
    """Contiguous-fill packing: offsets are cumulative mod budget,
    pack ids are non-decreasing in (doc_id, chunk_id) order, and every
    pack's chunks fit within budget + max_chunk - 1 (the fill bound)."""
    from rsoup_spark.ops.textstats import pack_chunks

    rows = [(d, c, 50 if c < 3 else 17) for d in range(20) for c in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id int, n_tokens int")
    out = pack_chunks(df, budget_tokens=128)
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["pack_id"],
         r["pack_offset"])
        for r in out.collect()
    )
    before = 0
    prev_pack = 0
    per_pack: dict = {}
    for _d, _c, n, pack, off in got:
        assert pack == before // 128
        assert off == before % 128
        assert pack >= prev_pack
        prev_pack = pack
        per_pack[pack] = per_pack.get(pack, 0) + n
        before += n
    max_chunk = 50
    assert all(v <= 128 + max_chunk - 1 for v in per_pack.values())


@pytest.mark.spark
def test_pack_chunks_exact_past_float53(spark):
    """pack_id is computed with integer DIV: cumulative token offsets
    beyond 2**53 (where float division rounds) still yield the exact
    oracle `before // budget`."""
    from rsoup_spark.ops.textstats import pack_chunks

    big = (1 << 52) + 1  # cumsum crosses 2**53 at the 3rd chunk
    rows = [(d, 0, big) for d in range(8)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_id int, n_tokens long"
    )
    budget = 3  # small enough that float(before)/budget visibly rounds
    out = sorted(
        (r["doc_id"], r["pack_id"], r["pack_offset"])
        for r in pack_chunks(df, budget_tokens=budget).collect()
    )
    before = 0
    for d, pack, off in out:
        assert pack == before // budget, (d, pack, before // budget)
        assert off == before % budget
        before += big
        # the float formulation is provably wrong somewhere in here
    assert any(
        int(float(i * big) / budget) != (i * big) // budget
        for i in range(8)
    ), "test inputs no longer exercise the float-rounding regime"


@pytest.mark.spark
def test_pack_chunks_bucket_autoscale(spark):
    """n_docs_hint raises bucket_docs so #buckets stays broadcastable;
    the packing itself is invariant to the bucket size."""
    from rsoup_spark.ops.textstats import MAX_PACK_BUCKETS, pack_chunks

    rows = [(d, c, 40 + 7 * c) for d in range(50) for c in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_id int, n_tokens int"
    )
    base = sorted(
        tuple(r) for r in pack_chunks(df, budget_tokens=100).collect()
    )
    hinted = sorted(
        tuple(r)
        for r in pack_chunks(
            df, budget_tokens=100, bucket_docs=1,
            n_docs_hint=MAX_PACK_BUCKETS * 10,
        ).collect()
    )
    assert base == hinted


@pytest.mark.spark
def test_repetition_stats_exact(spark):
    """Hand-computed duplicated-5-gram fractions, integer ppm."""
    from rsoup_spark.ops.textstats import repetition_stats

    rows = [
        (1, "a b c d e a b c d e"),   # 6 grams, 5 distinct -> 166666
        (2, "x x x x x x x x"),       # 4 grams, 1 distinct -> 750000
        (3, "one two three"),          # < 5 tokens -> 0 grams
        (4, "p q r s t"),              # exactly 1 gram, distinct
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_distinct"], r["rep_ppm"])
        for r in repetition_stats(df, n=5).collect()
    }
    assert got[1] == (6, 5, 1_000_000 // 6)
    assert got[2] == (4, 1, 750_000)
    assert got[3] == (0, 0, 0)
    assert got[4] == (1, 1, 0)


@pytest.mark.spark
def test_decontaminate_planted(spark):
    """A train doc sharing an 8-gram with the eval set is flagged with
    the exact distinct shared-gram count; others are not."""
    from rsoup_spark.ops.textstats import decontaminate

    shared = "q w e r t y u i"  # 8 tokens -> exactly one 8-gram
    ev = spark.createDataFrame(
        [(0, f"{shared} extra words here")], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [
            (1, f"prefix {shared} suffix"),   # contains the gram
            (2, "totally different words with no overlap at all ok"),
            (3, shared),                        # the gram exactly
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_shared_grams"]
        for r in decontaminate(tr, ev, n=8).collect()
    }
    assert got[1] == 1 and got[3] == 1 and 2 not in got


@pytest.mark.spark
def test_scrub_pii_masks_and_counts(spark):
    """One fixture doc per shipped pattern class + overlap cases:
    counts are per-[TOKEN]-contributed (computed on the progressively
    masked text), so a phone-shaped run inside an email counts once,
    as the email that masked it."""
    from rsoup_spark.ops.textstats import scrub_pii

    rows = [
        (1, "mail me at bob.smith+x@test-host.org or call 555-012-3456"),
        (2, "no pii here"),
        (3, "ssn 123-45-6789 ip 192.168.0.1 intl +4915123456789"),
        (4, "overlap 555-0123@example.com is just an email"),
        (5, "paren (555) 012-3456 and +1 555-012-3456 and +14155550123"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_email"], r["n_ssn"], r["n_ipv4"], r["n_phone"],
                      r["clean_text"])
        for r in scrub_pii(df).collect()
    }
    assert got[1] == (1, 0, 0, 1,
                      "mail me at [EMAIL] or call [PHONE]")
    assert got[2] == (0, 0, 0, 0, "no pii here")
    assert got[3] == (0, 1, 1, 1, "ssn [SSN] ip [IP] intl [PHONE]")
    # the ADVICE overlap case: the phone-shaped digits live inside the
    # email match, so they are masked (and counted) as email only
    assert got[4] == (1, 0, 0, 0, "overlap [EMAIL] is just an email")
    assert got[5] == (0, 0, 0, 3, "paren [PHONE] and [PHONE] and [PHONE]")


@pytest.mark.spark
def test_scrub_pii_matches_duckdb_oracle_semantics(spark):
    """Replay PII_PATTERNS verbatim through DuckDB (RE2) with the same
    sequential count-then-mask order and require identical counts and
    masked text on an adversarial ASCII battery -- the contract the
    driver's gate depends on.  Known divergence class, pinned below:
    Java's \\b treats non-ASCII letters as word chars, RE2 does not,
    so a digit run glued to a non-ASCII letter masks in RE2 only; the
    gate corpus and injected PII are ASCII, where both agree."""
    import duckdb

    from rsoup_spark.ops.textstats import PII_PATTERNS, scrub_pii

    cases = [
        "contact a@b.com or 555-012-3456",
        "555-0123@example.com",
        "ssn 123-45-6789 phone 123-456-7890",
        "ip 192.168.0.1 dottedphone 555.012.3456",
        "e164 +14155550123 and +4915123456789",
        "paren (555) 012-3456 and +1 555-012-3456",
        "1.2.3.4567 not-an-ip 1.2.3.4 yes",
        "x123-45-6789 glued to an ascii word char: no match",
        "john.doe+spam@mail.co.uk end",
        "+1234567 short +12345678 ok +1234567890123456 long",
        "10.0.0.1. trailing dot 999.999.999.999 shape-only",
        "a 555-012-3456b no trailing boundary",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    sp = {r["doc_id"]: r.asDict() for r in scrub_pii(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(cases):
        cur = t
        for name, pat, repl in PII_PATTERNS:
            n = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [cur, pat]
            ).fetchone()[0]
            assert sp[i][f"n_{name}"] == n, (i, name, t)
            cur = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [cur, pat, repl]
            ).fetchone()[0]
        assert sp[i]["clean_text"] == cur, (i, t)
    # pinned divergence: Java \b sees é as a word char (no boundary ->
    # no mask); RE2 would mask.  Out of the ASCII gate corpus.
    row = scrub_pii(
        spark.createDataFrame([(0, "é123-45-6789")],
                              "doc_id long, text string")
    ).first()
    assert row["n_ssn"] == 0 and row["clean_text"] == "é123-45-6789"
    con.close()


@pytest.mark.spark
def test_repetition_stats_invariants_random(spark):
    """Hypothesis-style invariants over random word-soup docs: grams
    count matches the window algebra, 0 <= rep_ppm < 1e6, rep_ppm == 0
    iff all grams distinct, and the Spark values equal a local Python
    recomputation."""
    import random

    from rsoup_spark.ops.textstats import repetition_stats

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(7)]
    rows = [
        (i, " ".join(rng.choice(vocab)
                     for _ in range(rng.randint(0, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_distinct"], r["rep_ppm"])
        for r in repetition_stats(df, n=5).collect()
    }
    for doc_id, text in rows:
        toks = text.split()
        grams = [
            " ".join(toks[i:i + 5]) for i in range(len(toks) - 4)
        ] if len(toks) >= 5 else []
        n_g, n_d = len(grams), len(set(grams))
        ppm = (n_g - n_d) * 1_000_000 // n_g if n_g else 0
        assert got[doc_id] == (n_g, n_d, ppm), doc_id
        assert 0 <= got[doc_id][2] < 1_000_000


@pytest.mark.spark
def test_densify_ids_string_order(spark):
    """Dense ids follow id SORT order (string order, not insertion or
    numeric order), 0..n-1 consecutive, across multiple range
    partitions."""
    from rsoup_spark.ops.textstats import densify_ids

    ids = [f"u{i:04d}" if i % 3 else f"b{i}" for i in range(500)]
    df = spark.createDataFrame([(s, s) for s in ids],
                               "sid string, payload string")
    got = {
        r["sid"]: r["dense_id"]
        for r in densify_ids(df, id_col="sid", n_partitions=7).collect()
    }
    want = {s: i for i, s in enumerate(sorted(ids))}
    assert got == want


@pytest.mark.spark
def test_densify_then_pack_string_corpus(spark):
    """pack_chunks over a string-id corpus via densify_ids equals the
    pack over the same corpus with the equivalent hand-built dense
    ids -- closing pack's 'numeric id_col required' gap."""
    from rsoup_spark.ops.textstats import (
        chunk_documents,
        densify_ids,
        pack_chunks,
    )

    rows = [
        (f"doc-{chr(ord('z') - i)}", " ".join(f"w{j}" for j in range(5 + i)))
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "sid string, text string")
    chunks = chunk_documents(docs, chunk_tokens=4, overlap=1,
                             id_col="sid")
    dense_chunks = densify_ids(chunks, id_col="doc_id",
                               out_col="dense_id")
    got = {
        (r["dense_id"], r["chunk_id"]): (r["pack_id"], r["pack_offset"])
        for r in pack_chunks(dense_chunks, budget_tokens=10,
                             id_col="dense_id").collect()
    }
    # hand-built reference: same chunks keyed by rank of sid
    rank = {s: i for i, s in enumerate(sorted(r[0] for r in rows))}
    ref_rows = sorted(
        (rank[r["doc_id"]], r["chunk_id"], r["n_tokens"])
        for r in chunks.collect()
    )
    before = 0
    want = {}
    for did, cid, n in ref_rows:
        want[(did, cid)] = (before // 10, before % 10)
        before += n
    assert got == want


@pytest.mark.spark
class TestGopherRules:
    """Gopher quality-filter flags (ops/textstats.py:gopher_rules):
    each rule isolated on a hand-computed doc, integer-exact ratios."""

    def _flags(self, spark, rows, **kw):
        from rsoup_spark.ops.textstats import gopher_rules

        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        return {r["doc_id"]: r.asDict()
                for r in gopher_rules(docs, **kw).collect()}

    def test_each_rule_isolated(self, spark):
        rows = [
            ("good", "the of " + "good word " * 29),
            ("short", "the of tiny doc"),
            ("longwords", "the of " + "abcdefghijkl " * 58),
            ("hashy", "the of " + "word " * 50 + "# " * 8),
            ("bullets",
             "the of mix\n" + "- aaaa bbbb cccc dddd eeee ffff gggg\n" * 20),
            ("numeric", "the of " + "word 12345 " * 29),
            ("nostop", "qqq www " * 30),
        ]
        got = self._flags(spark, rows)
        fail_rule = {
            "short": "r_word_count", "longwords": "r_word_len",
            "hashy": "r_symbols", "bullets": "r_bullets",
            "numeric": "r_alpha", "nostop": "r_stopwords",
        }
        assert got["good"]["keep"] is True
        rules = ["r_word_count", "r_word_len", "r_symbols",
                 "r_bullets", "r_alpha", "r_stopwords"]
        for did, bad in fail_rule.items():
            assert got[did]["keep"] is False, did
            for rule in rules:
                assert got[did][rule] is (rule != bad), (did, rule)

    def test_counts_hand_computed(self, spark):
        got = self._flags(spark, [
            ("e", "the of " + "word... " * 50),
            ("u", "the of w… and x… plus " + "pad " * 50),
        ])
        # 'word...' is one 7-char token; 50 ascii ellipses
        assert got["e"]["n_words"] == 52
        assert got["e"]["n_ellipsis"] == 50
        assert got["e"]["r_symbols"] is False  # 500 > 52
        # unicode ellipsis counted too: 2 in 56 words -> ratio ok
        assert got["u"]["n_ellipsis"] == 2
        assert got["u"]["r_symbols"] is True

    def test_empty_and_whitespace_docs(self, spark):
        # SQL TRIM strips spaces only (both engines), so the tab line
        # in c counts as a (non-bullet) line while b's space lines
        # vanish; either way no 0-division trap and no keep
        got = self._flags(spark, [("a", ""), ("b", "  \n  "),
                                  ("c", "  \n\t ")])
        assert [got[d]["n_lines"] for d in "abc"] == [0, 0, 1]
        for d in ("a", "b", "c"):
            assert got[d]["n_words"] == 0
            assert got[d]["keep"] is False      # word count floor
            assert got[d]["r_bullets"] is True  # no 0-division trap

    def test_boundaries_inclusive(self, spark):
        # exactly 50 words of exactly 3 chars, 2 stopwords -> keep;
        # mean word length lands ON the lower bound (3.0)
        text = "the and " + "aaa " * 48
        got = self._flags(spark, [("b", text)])
        assert got["b"]["n_words"] == 50
        assert got["b"]["sum_word_len"] == 150
        assert got["b"]["keep"] is True

    def test_word_count_bounds_configurable(self, spark):
        got = self._flags(
            spark, [("a", "the of one two three")],
            min_words=5, max_words=5,
        )
        assert got["a"]["r_word_count"] is True
        assert got["a"]["keep"] is True


@pytest.mark.spark
class TestC4Filters:
    """C4 cleaning heuristics (ops/textstats.py:c4_filters)."""

    def _rows(self, spark, rows, **kw):
        from rsoup_spark.ops.textstats import c4_filters

        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        return {r["doc_id"]: r.asDict()
                for r in c4_filters(docs, **kw).collect()}

    def test_line_filter_and_keep(self, spark):
        good = ("A first full sentence.\nA second full sentence!\n"
                "A third full one?\nA fourth one here.\nThe fifth lands.")
        got = self._rows(spark, [
            ("good", good),
            ("few", "Only one sentence here.\nAnd a second one."),
            ("lorem", good + "\nLorem Ipsum dolor sit."),
            ("brace", good + "\nBrace { in code }."),
            ("bare", "no terminal punct\nshort.\nanother bare line"),
        ])
        assert got["good"]["keep"] is True
        assert got["few"]["keep"] is False and got["few"]["n_sentences"] == 2
        assert got["lorem"]["has_policy"] is True
        assert got["lorem"]["keep"] is False
        assert got["brace"]["has_brace"] is True
        assert got["brace"]["keep"] is False
        # the bare doc loses every line: no terminal punct, and the
        # one punctuated line has < 3 words
        assert got["bare"]["n_kept"] == 0
        assert got["bare"]["clean_text"] == ""
        assert got["bare"]["keep"] is False

    def test_sentence_runs_counted_not_chars(self, spark):
        # 'Wait... what?! Really?' = three terminal runs, not six chars
        got = self._rows(
            spark, [("m", 'He said "go".\nWait... what?! Really?')],
        )
        # line 1: one " run mid-line + one ". run = 2; line 2: 3 runs
        assert got["m"]["n_sentences"] == 5

    def test_quote_terminal_and_min_line_words(self, spark):
        got = self._rows(
            spark,
            [("q", 'A quoted ending line "\nToo few.')],
            min_sentences=1,
        )
        assert got["q"]["n_kept"] == 1  # quote line kept, short dropped
        assert got["q"]["clean_text"] == 'A quoted ending line "'
        assert got["q"]["keep"] is True

    def test_policy_match_case_insensitive(self, spark):
        got = self._rows(
            spark,
            [("p", "This mentions LOREM IPSUM plainly today okay fine.")],
            min_sentences=1,
        )
        assert got["p"]["has_policy"] is True
        assert got["p"]["keep"] is False

    def test_empty_doc(self, spark):
        got = self._rows(spark, [("e", "")])
        assert (got["e"]["n_lines"], got["e"]["n_kept"],
                got["e"]["n_sentences"]) == (0, 0, 0)
        assert got["e"]["clean_text"] == ""
        assert got["e"]["keep"] is False


@pytest.mark.spark
def test_corpus_clean_dedups_after_cleaning(spark):
    """The composite's stage order is the point: a doc differing from
    another only by a boilerplate line the C4 filter strips must
    deduplicate against it POST-cleaning (raw-text dedup would keep
    both)."""
    from rsoup_spark.ops.textstats import corpus_clean

    good = "\n".join(
        ["The quick brown fox jumps over the lazy dog and runs far"
         " away today."] * 10
    )
    rows = [
        (0, good),
        (1, "no terminal punct boilerplate\n" + good),  # dup post-clean
        (2, good + "\nLorem Ipsum appears in this line today."),  # C4
        (3, "\n".join(["Li ne one okay."] * 6)),  # gopher word floor
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r.asDict() for r in corpus_clean(df).collect()}
    assert got[0]["keep"] and got[0]["is_canonical"]
    assert got[1]["keep_c4"] and got[1]["keep_gopher"]
    assert not got[1]["is_canonical"] and not got[1]["keep"]
    assert not got[2]["keep_c4"] and not got[2]["keep"]
    assert got[3]["keep_c4"] and not got[3]["keep_gopher"]
    assert got[0]["n_words"] == got[1]["n_words"] == 140
