"""Spark-level tests: extraction operators, entry contract, ops recall."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.mark.spark
class TestExtractOperators:
    def test_extract_spans_schema_and_values(self, spark):
        from rsoup_spark.operators.extract import extract_spans
        from rsoup_spark.sources.docs import synth_html_docs

        docs = synth_html_docs(spark, SF_SMALL)
        spans = extract_spans(docs, "url", "html")
        row = spans.orderBy("doc_id").first()
        kinds = [s["kind"] for s in row["spans"]]
        assert kinds == ["h1", "text", "a", "img"]
        # offsets strictly non-decreasing = interleaved order
        offs = [s["offset"] for s in row["spans"]]
        assert offs == sorted(offs)

    def test_extract_tables_roundtrip(self, spark):
        from rsoup_spark.operators.extract import extract_tables
        from rsoup_spark.sources.docs import synth_html_docs

        docs = synth_html_docs(spark, SF_SMALL)
        tables = extract_tables(docs)
        t = tables.first()
        assert t["n_rows"] == 2 and t["n_cols"] == 2
        assert t["rows"][0]["cells"][0]["value"]["text"] == "lang"
        assert t["rows"][0]["cells"][0]["is_header"] is True
        # richtext elements carry parent indices, root first
        el = t["rows"][0]["cells"][0]["value"]["elements"]
        assert el[0]["parent"] == -1

    def test_entry_contract(self, spark):
        import __spark_entry__ as e

        df = e.entry(spark)
        assert df.count() > 0
        assert set(df.columns) == {"doc_id", "kind", "text", "media_ref",
                                   "offset"}
        qs = e.queries()
        oracles = e.oracle_sql()
        assert set(oracles) <= set(qs)

    def test_links_pipeline(self, spark):
        from rsoup_spark.operators.extract import (
            extract_spans,
            links_from_spans,
        )
        from rsoup_spark.sources.docs import synth_html_docs

        docs = synth_html_docs(spark, SF_SMALL)
        links = links_from_spans(extract_spans(docs, "url", "html"))
        n_docs = docs.count()
        assert links.count() == n_docs  # one anchor per synth page


@pytest.mark.spark
class TestOpsRecall:
    def test_minhash_lsh_recall(self, spark):
        """LSH candidates must recover the high-jaccard ground truth."""
        from rsoup_spark.ops.dedup import jaccard_pairs, minhash_lsh_pairs
        from rsoup_spark.sources.docs import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        truth = {
            (r["id_a"], r["id_b"])
            for r in jaccard_pairs(docs, ngram=3, threshold=0.7).collect()
        }
        found = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                docs, ngram=3, num_hashes=64, bands=16, threshold=0.5
            ).collect()
        }
        assert truth, "fixture should contain near-dup docs"
        recall = len(truth & found) / len(truth)
        assert recall >= 0.9, f"LSH recall too low: {recall}"

    def test_simhash_agrees_with_exact_dups(self, spark):
        from pyspark.sql import functions as F

        from rsoup_spark.ops.dedup import simhash_pairs
        from rsoup_spark.sources.docs import load_table

        docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
        doubled = docs.unionByName(
            docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
        )
        pairs = simhash_pairs(doubled, max_hamming=0)
        found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        n = docs.count()
        expect = {(i, i + 10_000) for i in range(n)}
        assert expect <= found

    def test_lsh_hot_bucket_cap_bounds_candidates(self, spark):
        """Degenerate corpus (thousands of docs sharing every band):
        the bucket cap collapses the quadratic self-join to a min-id
        star, so the pair count stays O(n) -- and the star keeps the
        duplicate set fully connected for the cluster stage."""
        from rsoup_spark.ops.dedup import dup_clusters, minhash_lsh_pairs

        n = 3000  # uncapped would emit ~4.5M pairs x 16 bands
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.lit("the same boilerplate text repeated on every page "
                  "of this template heavy website").alias("text"),
        )
        pairs = minhash_lsh_pairs(
            docs, ngram=3, num_hashes=64, bands=16, threshold=0.5,
            max_bucket_size=100,
        ).collect()
        # identical docs -> identical signatures -> every band is one
        # hot bucket; the star emits exactly (rep=0, other) per band,
        # distinct-collapsed across bands
        assert len(pairs) == n - 1
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {
            (0, i) for i in range(1, n)
        }
        assert all(r["sim"] == 1.0 for r in pairs)
        labels = dup_clusters(
            spark.createDataFrame(
                [(r["id_a"], r["id_b"]) for r in pairs],
                "id_a long, id_b long",
            )
        ).collect()
        assert len(labels) == n
        assert {r["canonical_id"] for r in labels} == {0}

    def test_lsh_cap_is_invisible_below_cap(self, spark):
        """On a normal corpus (all buckets under the cap) the capped
        and uncapped paths return identical pairs -- the gate query's
        oracle equality is untouched by the default cap."""
        from rsoup_spark.ops.dedup import minhash_lsh_pairs, simhash_pairs
        from rsoup_spark.sources.docs import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        capped = set(
            map(tuple, minhash_lsh_pairs(docs, max_bucket_size=1000)
                .collect())
        )
        uncapped = set(
            map(tuple, minhash_lsh_pairs(docs, max_bucket_size=None)
                .collect())
        )
        assert capped == uncapped
        sh_capped = set(
            map(tuple, simhash_pairs(docs, max_bucket_size=1000).collect())
        )
        sh_uncapped = set(
            map(tuple, simhash_pairs(docs, max_bucket_size=None).collect())
        )
        assert sh_capped == sh_uncapped

    def test_ivf_recall_vs_brute(self, spark):
        """IVF with n_probe=n_cells degenerates to exact search; with
        fewer probes it must still return valid cosines <= brute best."""
        from rsoup_spark.ops.similarity import cosine_topk, ivf_topk
        from rsoup_spark.sources.docs import load_table

        emb = load_table(spark, SF_SMALL, "embeddings")
        q = emb.where(F.col("vec_id") % 100 == 0)
        brute = {
            (r["query_id"], r["neighbor_id"]): r["cos"]
            for r in cosine_topk(emb, q, k=5).collect()
        }
        # full probe = exact: results must match brute exactly
        full = {
            (r["query_id"], r["neighbor_id"]): r["cos"]
            for r in ivf_topk(emb, q, k=5, n_cells=8, n_probe=8).collect()
        }
        assert full == brute
        # partial probe: valid subset with correct cosines
        part = ivf_topk(emb, q, k=5, n_cells=8, n_probe=2).collect()
        bbest = max(brute.values())
        assert part and all(r["cos"] <= bbest + 1e-9 for r in part)
        recall = len(
            {(r["query_id"], r["neighbor_id"]) for r in part}
            & set(brute)
        ) / len(brute)
        assert recall >= 0.2, recall

    def test_ann_lsh_subset_of_brute(self, spark):
        from rsoup_spark.ops.similarity import cosine_topk, lsh_ann_topk
        from rsoup_spark.sources.docs import load_table

        emb = load_table(spark, SF_SMALL, "embeddings")
        q = emb.where(F.col("vec_id") % 100 == 0)
        brute = cosine_topk(emb, q, k=5)
        ann = lsh_ann_topk(emb, q, k=5)
        arows = ann.collect()
        assert arows and all(r["query_id"] != r["neighbor_id"] for r in arows)
        # the synthetic embeddings are near-random (max pairwise cos ~0.5)
        # so exact-top-k recall is not meaningful; instead assert the LSH
        # buckets correlate with similarity: mean cos of ANN hits must
        # beat the corpus-wide mean pairwise cos by a clear margin
        mean_ann = sum(r["cos"] for r in arows) / len(arows)
        all_mean = (
            emb.alias("a")
            .crossJoin(emb.alias("b"))
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.avg(
                    __import__(
                        "rsoup_spark.ops.similarity", fromlist=["cosine"]
                    ).cosine(
                        F.col("a.embedding").cast("array<double>"),
                        F.col("b.embedding").cast("array<double>"),
                    )
                ).alias("m")
            )
            .first()["m"]
        )
        assert mean_ann > all_mean + 0.05, (mean_ann, all_mean)
        # and the exact path is self-consistent: brute top-5 cos >= ANN cos
        bbest = {r["query_id"]: r["cos"] for r in brute.collect()
                 if r["rank"] == 1}
        for r in arows:
            assert r["cos"] <= bbest[r["query_id"]] + 1e-9

    def test_sig_udf_matches_expression(self, spark):
        """The vectorized numpy signature GEMM must produce bit-identical
        buckets to the reference JVM literal-expression path for every
        table (the SQL oracles replay the expression construction)."""
        from rsoup_spark.ops.similarity import _hyperplane_sig, _sig_udf
        from rsoup_spark.sources.docs import load_table

        emb = load_table(spark, SF_SMALL, "embeddings")
        v = F.col("embedding").cast("array<double>")
        n_tables = 3
        expr_cols = [
            _hyperplane_sig(v, 8, 64, seed=42 + t).alias(f"e{t}")
            for t in range(n_tables)
        ]
        sig = _sig_udf(8, 64, n_tables)
        rows = emb.select("vec_id", *expr_cols,
                          sig(v).alias("udf")).collect()
        assert rows
        for r in rows:
            assert [r[f"e{t}"] for t in range(n_tables)] == list(r["udf"]), (
                r["vec_id"]
            )

    def test_emb_dup_lsh_equals_exact(self, spark):
        """LSH-default near-dup pairs must equal BOTH exact methods on
        the planted-duplicate fixture (100% recall at tau; the exact
        blocked GEMM is the verification oracle for the LSH path)."""
        import __spark_entry__ as e
        from rsoup_spark.ops.similarity import embedding_dup_pairs

        emb = e.load_table(spark, SF_SMALL, "embeddings").select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        pert = emb.select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 0, x * 1.25).otherwise(x),
            ).alias("embedding"),
        )
        allv = emb.unionByName(pert)

        def pairs(method):
            return {
                (r["id_a"], r["id_b"], r["cos"])
                for r in embedding_dup_pairs(
                    allv, tau=0.95, method=method
                ).collect()
            }

        lsh, gemm, join = pairs("lsh"), pairs("gemm"), pairs("join")
        assert gemm == join
        assert lsh == join, (
            f"LSH missed {len(join - lsh)} / found {len(lsh - join)} extra"
        )
        assert len(lsh) >= emb.count()  # every original has its plant


@pytest.mark.spark
class TestDupClusters:
    def test_transitive_chain_and_string_ids(self, spark):
        """a-b, b-c chain collapses to one component labeled min(a);
        a disjoint pair keeps its own min; ids are strings to pin the
        operator generic over id types."""
        from rsoup_spark.ops.dedup import dup_clusters

        pairs = spark.createDataFrame(
            [("d2", "d1"), ("d2", "d3"), ("d9", "d8")],
            "id_a STRING, id_b STRING",
        )
        got = {
            r["doc_id"]: r["canonical_id"]
            for r in dup_clusters(pairs).collect()
        }
        assert got == {
            "d1": "d1", "d2": "d1", "d3": "d1",
            "d8": "d8", "d9": "d8",
        }

    def test_long_chain_converges(self, spark):
        """A 12-node path graph (worst-case diameter for label
        propagation) still converges to a single component."""
        from rsoup_spark.ops.dedup import dup_clusters

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "id_a LONG, id_b LONG"
        )
        rows = dup_clusters(pairs).collect()
        assert len(rows) == 13
        assert {r["canonical_id"] for r in rows} == {0}


@pytest.mark.spark
class TestLineDedup:
    def test_hand_computed(self, spark):
        from rsoup_spark.ops.dedup import line_dedup

        # "shared" appears in 3 distinct docs (min_df=3 -> removed,
        # including BOTH copies inside doc c); uniques survive in
        # original order; doc d is all boilerplate -> empty clean_text
        rows = [
            ("a", "shared\nbody a\ntail a"),
            ("b", "body b\nshared"),
            ("c", "shared\nmid c\nshared"),
            ("d", "shared"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r["doc_id"]: r for r in
               line_dedup(docs, min_df=3).collect()}
        assert got["a"]["clean_text"] == "body a\ntail a"
        assert (got["a"]["n_lines"], got["a"]["n_removed"]) == (3, 1)
        assert got["b"]["clean_text"] == "body b"
        assert got["c"]["clean_text"] == "mid c"
        assert got["c"]["n_removed"] == 2
        assert got["d"]["clean_text"] == ""
        assert (got["d"]["n_lines"], got["d"]["n_removed"]) == (1, 1)

    def test_within_doc_repeats_dont_count(self, spark):
        from rsoup_spark.ops.dedup import line_dedup

        # "x" repeats 5x inside ONE doc: df = 1 distinct doc, kept
        docs = spark.createDataFrame(
            [("a", "x\nx\nx\nx\nx"), ("b", "y")], ["doc_id", "text"])
        got = {r["doc_id"]: r for r in
               line_dedup(docs, min_df=3).collect()}
        assert got["a"]["clean_text"] == "x\nx\nx\nx\nx"
        assert got["a"]["n_removed"] == 0

    def test_blank_lines_are_structure_not_boilerplate(self, spark):
        from rsoup_spark.ops.dedup import line_dedup

        # every doc has paragraph breaks ('' occurs in >= min_df docs):
        # the blanks must survive or paragraph formatting collapses
        rows = [(str(i), f"intro {i}\n\nbody {i}\n") for i in range(4)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r["doc_id"]: r for r in
               line_dedup(docs, min_df=3).collect()}
        assert got["0"]["clean_text"] == "intro 0\n\nbody 0\n"
        assert got["0"]["n_removed"] == 0


@pytest.mark.spark
class TestDuplicateSubstrings:
    """ExactSubstr-style duplicated-run detection
    (ops/dedup.py:duplicate_substrings)."""

    def _run(self, spark, rows, **kw):
        from rsoup_spark.ops.dedup import duplicate_substrings

        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        return sorted(
            (r["doc_id"], r["start_tok"], r["end_tok"],
             r["n_tokens"], r["dup_text"])
            for r in duplicate_substrings(docs, **kw).collect()
        )

    def test_hand_computed_runs(self, spark):
        # 6-token block shared by a and b, with unique delimiters; at
        # k=3, min_len=4 the maximal run covers exactly the block
        blk = "p q r s t u"
        got = self._run(
            spark,
            [("a", f"a1 a2 {blk} a3"), ("b", f"b1 {blk} b2 b3")],
            k=3, min_len=4,
        )
        assert got == [
            ("a", 2, 7, 6, blk),
            ("b", 1, 6, 6, blk),
        ]

    def test_two_runs_one_doc_and_min_len(self, spark):
        # doc a shares TWO separated blocks with b (one above, one
        # below min_len): only the long one survives; the short gap
        # token is unique so the runs never merge
        long_blk = "w1 w2 w3 w4 w5"
        short_blk = "v1 v2 v3"
        rows = [
            ("a", f"{long_blk} ga {short_blk}"),
            ("b", f"{long_blk} gb {short_blk}"),
        ]
        got = self._run(spark, rows, k=3, min_len=4)
        assert got == [
            ("a", 0, 4, 5, long_blk),
            ("b", 0, 4, 5, long_blk),
        ]

    def test_intra_doc_repeats_not_flagged(self, spark):
        # the block repeats twice inside ONE doc: df = 1 distinct doc,
        # so nothing is reported (repetition_stats' territory)
        blk = "r1 r2 r3 r4"
        got = self._run(
            spark,
            [("a", f"{blk} mid {blk}"), ("b", "zz yy xx ww")],
            k=3, min_len=3,
        )
        assert got == []

    def test_short_docs_and_param_guard(self, spark):
        import pytest as _pytest

        from rsoup_spark.ops.dedup import duplicate_substrings

        # docs shorter than k tokens produce no grams and no rows
        got = self._run(
            spark, [("a", "one two"), ("b", "one two")], k=3, min_len=3
        )
        assert got == []
        docs = spark.createDataFrame([("a", "x")], ["doc_id", "text"])
        with _pytest.raises(ValueError, match="min_len >= k"):
            duplicate_substrings(docs, k=4, min_len=3)

    def test_run_is_maximal_not_per_gram(self, spark):
        # overlapping duplicated grams merge into ONE maximal run,
        # never one row per gram
        blk = " ".join(f"t{i}" for i in range(12))
        got = self._run(
            spark,
            [("a", f"ua {blk}"), ("b", f"{blk} ub")],
            k=4, min_len=8,
        )
        assert got == [
            ("a", 1, 12, 12, blk),
            ("b", 0, 11, 12, blk),
        ]


@pytest.mark.spark
def test_duplicate_substrings_fuzz_vs_bruteforce(spark):
    """Randomized corpora vs an independent brute-force reference:
    enumerate every k-gram per doc, mark grams seen in >= 2 distinct
    docs, merge adjacent positions, emit runs >= min_len tokens.  Small
    vocabulary forces heavy cross-doc overlap, repeats, and boundary
    runs."""
    import random

    from rsoup_spark.ops.dedup import duplicate_substrings

    rng = random.Random(20260818)
    k, min_len = 3, 5
    vocab = [f"w{i}" for i in range(9)]
    docs = [
        (f"d{i}", " ".join(rng.choice(vocab)
                           for _ in range(rng.randint(0, 25))))
        for i in range(30)
    ]

    def brute(corpus):
        grams: dict = {}
        for did, text in corpus:
            toks = text.split()
            for p in range(len(toks) - k + 1):
                grams.setdefault(tuple(toks[p:p + k]), set()).add(did)
        dup = {g for g, dids in grams.items() if len(dids) >= 2}
        out = []
        for did, text in corpus:
            toks = text.split()
            hits = [p for p in range(len(toks) - k + 1)
                    if tuple(toks[p:p + k]) in dup]
            run: list = []
            for p in hits + [None]:
                if run and (p is None or p != run[-1] + 1):
                    start, end = run[0], run[-1] + k - 1
                    if end - start + 1 >= min_len:
                        out.append((did, start, end, end - start + 1,
                                    " ".join(toks[start:end + 1])))
                    run = []
                if p is not None:
                    run.append(p)
        return sorted(out)

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(
        tuple(r) for r in
        duplicate_substrings(df, k=k, min_len=min_len).collect()
    )
    assert got == brute(docs)


@pytest.mark.spark
def test_simhash_vectorized_equals_expr_reference(spark):
    """The vectorized simhash64 (hashlib + numpy popcount) must equal
    the SQL-expressible reference construction simhash64_expr exactly
    -- including on the tokenization edge cases where Java and Python
    string semantics diverge if replicated sloppily: unicode whitespace
    (Java \\s is ASCII-only), tab/control chars (Spark trim strips
    0x20 only), empty text (split('') -> ['']), and NULL (no row)."""
    from rsoup_spark.ops.dedup import simhash64, simhash64_expr

    hostile = [
        (1, "plain words here"),
        (2, ""),                      # [''] single empty token
        (3, None),                    # no row
        (4, "a b"),              # unicode NBSP: ONE token in Java \s
        (5, "\tleading tab"),         # trim keeps \t; split yields ['', ...]
        (6, "trailing space "),
        (7, "a  b\t\tc\nd"),
        (8, "word " * 200),
    ]
    df = spark.createDataFrame(hostile, "doc_id LONG, text STRING")
    ref = {(r["doc_id"], r["simhash"])
           for r in simhash64_expr(df).collect()}
    got = {(r["doc_id"], r["simhash"]) for r in simhash64(df).collect()}
    assert got == ref

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref2 = {(r["doc_id"], r["simhash"])
            for r in simhash64_expr(corpus).collect()}
    got2 = {(r["doc_id"], r["simhash"]) for r in simhash64(corpus).collect()}
    assert got2 == ref2
