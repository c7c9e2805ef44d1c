"""BM25 ranked retrieval + eval-set decontamination: DuckDB oracle parity
on the real sf0.001 documents table, plus plan-shape assertions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from geocube_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_sql,
    decontamination_overlap,
    decontamination_overlap_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestBM25:
    def test_matches_duckdb_oracle(self, docs, duck):
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(docs, ["join", "hash", "vector"], k=12).collect()
        ]
        want = duck.sql(bm25_topk_sql(["join", "hash", "vector"], k=12)).fetchall()
        assert got == [(d, s) for d, s in want]

    def test_scores_positive_and_sorted(self, docs):
        rows = bm25_topk(docs, ["join"], k=8).collect()
        scores = [r["score"] for r in rows]
        assert all(s > 0 for s in scores)
        assert scores == sorted(scores, reverse=True)

    def test_absent_term_empty(self, docs):
        assert bm25_topk(docs, ["zzzqqqxxx"], k=5).count() == 0

    def test_plan_no_cartesian_and_early_filter(self, docs):
        plan = bm25_topk(docs, ["join", "hash"], k=5)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # the query-term IN filter must sit below the first exchange: the
        # generated Filter mentioning the terms appears after (deeper than)
        # the first Exchange line in the plan dump
        assert "join" in plan and "hash" in plan


class TestChunking:
    def test_matches_duckdb_oracle(self, docs, duck):
        from geocube_spark.operators.retrieval import document_chunks, document_chunks_sql

        got = sorted(
            (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
            for r in document_chunks(docs, 64, 16).collect()
        )
        want = sorted(duck.sql(document_chunks_sql(64, 16)).fetchall())
        assert got == want

    def test_overlap_semantics(self, spark):
        from geocube_spark.operators.retrieval import document_chunks

        text = " ".join(f"w{i}" for i in range(100))
        one = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            document_chunks(one, chunk_tokens=40, overlap=10).collect(),
            key=lambda r: r["chunk_idx"],
        )
        # stride 30: starts at 0, 30, 60 — the chunk starting at 60 reaches
        # the end (60+40=100), so exactly 3 chunks
        assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
        c0, c1 = rows[0]["chunk_text"].split(), rows[1]["chunk_text"].split()
        assert c0[30:] == c1[:10]  # overlap carried
        assert rows[2]["chunk_text"].split()[-1] == "w99"

    def test_no_shuffle(self, docs):
        from geocube_spark.operators.retrieval import document_chunks

        plan = document_chunks(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_rejects_bad_overlap(self, docs):
        from geocube_spark.operators.retrieval import document_chunks

        with pytest.raises(ValueError):
            document_chunks(docs, chunk_tokens=16, overlap=16)


class TestUnigramLogprob:
    def test_matches_duckdb_oracle(self, docs, duck):
        from geocube_spark.operators.retrieval import unigram_logprob, unigram_logprob_sql

        got = sorted(
            (r["doc_id"], r["n_tokens"], r["mean_nll"])
            for r in unigram_logprob(docs).collect()
        )
        want = sorted(duck.sql(unigram_logprob_sql()).fetchall())
        assert got == want

    def test_rare_tokens_score_worse(self, spark):
        from geocube_spark.operators.retrieval import unigram_logprob

        common = " ".join(["the"] * 50)
        rare = "xylophone quixotic zephyr"
        df = spark.createDataFrame(
            [(1, common), (2, common), (3, rare)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r["mean_nll"] for r in unigram_logprob(df).collect()}
        assert out[3] > out[1]


class TestDecontamination:
    def test_matches_duckdb_oracle(self, docs, duck):
        out = decontamination_overlap(docs, F.col("doc_id") % 7 == 0, n=5)
        got = sorted(
            (r["train_doc_id"], r["eval_doc_id"], r["n_shared"]) for r in out.collect()
        )
        want = sorted(
            duck.sql(decontamination_overlap_sql("doc_id % 7 = 0", n=5)).fetchall()
        )
        assert got == want
        assert len(got) > 0  # fixture corpus contains near-dup pairs

    def test_self_overlap_excluded(self, docs):
        out = decontamination_overlap(docs, F.col("doc_id") % 7 == 0, n=5)
        assert out.filter(F.col("train_doc_id") == F.col("eval_doc_id")).count() == 0

    def test_short_docs_no_grams(self, spark):
        one = spark.createDataFrame(
            [(1, "too short"), (2, "also very short text"), (3, "too short")],
            "doc_id long, text string",
        )
        # n=8 > every doc length -> no shingles -> no pairs (and no error
        # from Spark's descending-sequence pitfall)
        out = decontamination_overlap(one, F.col("doc_id") == 3, n=8)
        assert out.count() == 0

    def test_eval_side_broadcast(self, docs):
        out = decontamination_overlap(docs, F.col("doc_id") % 7 == 0, n=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestDuplicatedPassages:
    def test_known_spans(self, spark):
        from geocube_spark.operators.passages import (
            duplicated_passage_report,
            duplicated_passage_spans,
        )

        boiler = "all rights reserved no part may be reproduced " \
                 "without permission"  # 10 tokens
        rows = [
            (0, f"alpha beta {boiler} gamma delta"),
            (1, f"{boiler} something completely different here follows now"),
            (2, "no duplication in this document at all whatsoever today"),
        ]
        docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        spans = {
            r["doc_id"]: r
            for r in duplicated_passage_spans(docs, k=8, min_count=2).collect()
        }
        # doc 0: boiler occupies tokens 3..12 -> shared k-grams start 3..5
        assert (spans[0]["span_start"], spans[0]["span_end"]) == (3, 12)
        assert spans[0]["n_grams"] == 3
        # doc 1: boiler at tokens 1..10 -> gram starts 1..3
        assert (spans[1]["span_start"], spans[1]["span_end"]) == (1, 10)
        assert 2 not in spans  # clean doc emits nothing

        rep = {
            r["doc_id"]: r
            for r in duplicated_passage_report(docs, k=8, min_count=2).collect()
        }
        assert rep[0]["n_dup_tokens"] == 10 and rep[0]["n_spans"] == 1
        assert rep[1]["longest_span"] == 10

    def test_two_disjoint_spans_not_merged(self, spark):
        from geocube_spark.operators.passages import duplicated_passage_report

        a = "one two three four five six seven eight"  # 8 tokens
        b = "red orange yellow green blue indigo violet ultraviolet"
        rows = [
            (0, f"{a} filler words in the middle of it {b}"),
            (1, f"{a} completely other tail content here now today ok"),
            (2, f"prefix stuff before the rainbow starts here now {b}"),
        ]
        docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        rep = {
            r["doc_id"]: r
            for r in duplicated_passage_report(docs, k=8, min_count=2).collect()
        }
        assert rep[0]["n_spans"] == 2
        assert rep[0]["n_dup_tokens"] == 16

    def test_null_text_docs_are_skipped(self, spark):
        """Regression: xxhash64(NULL) is the constant seed, so null-text
        docs would otherwise all collide into one fake duplicate cluster
        (and diverge from SQL, where a NULL gram joins nothing)."""
        from geocube_spark.operators.passages import duplicated_passage_report

        rows = [
            (0, None),
            (1, None),
            (2, None),
            (3, "totally unique text right here for this one document"),
        ]
        docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        assert duplicated_passage_report(docs, k=8, min_count=2).count() == 0


class TestHybridRRF:
    def test_matches_duckdb_oracle(self, spark, docs, duck):
        from geocube_spark.operators.retrieval import hybrid_rrf, hybrid_rrf_sql
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        got = [
            (r["doc_id"], r["rrf_score"], r["r_lex"], r["r_sem"])
            for r in hybrid_rrf(docs, emb, ["join", "hash"], qv, k=10).collect()
        ]
        want = duck.sql(hybrid_rrf_sql(["join", "hash"], k=10)).fetchall()
        assert got == [tuple(w) for w in want]

    def test_doc_in_both_lists_beats_single_list_peer(self, spark):
        from geocube_spark.operators.retrieval import hybrid_rrf

        # doc 1 matches the query term AND has the closest embedding;
        # doc 2 only matches the term; doc 3 only the embedding
        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha gamma"), (3, "delta")],
            "doc_id long, text string",
        )
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1])],
            "vec_id long, embedding array<double>",
        )
        rows = hybrid_rrf(docs, emb, ["alpha"], [1.0, 0.0], k=3).collect()
        assert rows[0]["doc_id"] == 1
        assert rows[0]["r_lex"] >= 1 and rows[0]["r_sem"] == 1
        # absent-list sentinel: doc 3 never matched the term
        d3 = next(r for r in rows if r["doc_id"] == 3)
        assert d3["r_lex"] == 0


class TestPerplexityBuckets:
    """CCNet-style head/middle/tail partition: the exact ntile twin is
    oracle-checked in the registry; here the SKETCH-threshold scale path
    (no global sort) must agree with the exact cut away from boundaries."""

    def test_buckets_are_equal_thirds_and_ordered(self, docs):
        from geocube_spark.operators.retrieval import perplexity_buckets

        rows = {r["bucket"]: r for r in perplexity_buckets(docs).collect()}
        assert set(rows) == {"head", "middle", "tail"}
        n = sum(r["n_docs"] for r in rows.values())
        assert max(r["n_docs"] for r in rows.values()) - min(
            r["n_docs"] for r in rows.values()
        ) <= 1
        assert n == docs.count()
        # perplexity strictly ascends head -> middle -> tail
        assert rows["head"]["max_nll"] <= rows["middle"]["min_nll"]
        assert rows["middle"]["max_nll"] <= rows["tail"]["min_nll"]

    def test_sketch_assign_agrees_with_exact_cut(self, docs):
        from pyspark.sql import Window

        from geocube_spark.operators.retrieval import (
            perplexity_bucket_assign,
            unigram_logprob,
        )

        got = {
            r["doc_id"]: r["bucket"]
            for r in perplexity_bucket_assign(docs).collect()
        }
        nll = unigram_logprob(docs)
        w = Window.orderBy("mean_nll", "doc_id")
        lab = F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.ntile(3).over(w),
        )
        want = {
            r["doc_id"]: r["bucket"]
            for r in nll.withColumn("bucket", lab).collect()
        }
        agree = sum(got[d] == want[d] for d in want)
        # boundary docs (ties at a cut point) may differ; the bulk must not
        assert agree >= 0.95 * len(want)

    def test_assign_plan_has_no_global_sort(self, docs):
        from geocube_spark.operators.retrieval import perplexity_bucket_assign

        plan = (
            perplexity_bucket_assign(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the scale path must not range-shuffle doc rows into one ordering
        assert "rangepartitioning" not in plan.lower()
        assert "ntile(" not in plan.lower()  # window fn ("percentile_approx" ok)


class TestNaiveBayesLangid:
    """Multinomial NB language classifier: diagonal dominance where the
    labels carry signal, determinism, and every scored doc classified."""

    def test_confusion_covers_all_tokenizable_docs(self, docs, spark):
        from geocube_spark.operators.retrieval import (
            nb_lang_confusion,
            tokens_expr,
        )

        conf = nb_lang_confusion(docs).collect()
        n_classified = sum(r["n_docs"] for r in conf)
        n_tokenizable = docs.filter(
            F.size(tokens_expr(F.col("text"))) > 0
        ).count()
        assert n_classified == n_tokenizable

    def test_deterministic(self, docs):
        from geocube_spark.operators.retrieval import nb_lang_confusion

        a = {tuple(r) for r in nb_lang_confusion(docs).collect()}
        b = {tuple(r) for r in nb_lang_confusion(docs).collect()}
        assert a == b

    def test_separable_corpus_classifies_perfectly(self, spark):
        # two classes with disjoint vocabularies: NB must recover them
        from geocube_spark.operators.retrieval import nb_lang_confusion

        rows = [(i, "aaa bbb ccc ddd eee " * 3, "x") for i in range(10)] + [
            (i + 10, "fff ggg hhh iii jjj " * 3, "y") for i in range(10)
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        conf = {(r["actual"], r["predicted"]): r["n_docs"]
                for r in nb_lang_confusion(d).collect()}
        assert conf == {("x", "x"): 10, ("y", "y"): 10}


class TestWinnowing:
    """MOSS winnowing: the w+k-1 shared-run guarantee and the thinning
    rate."""

    def test_shared_run_guarantee(self, spark):
        from geocube_spark.operators.passages import winnow_pairs

        shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
        rows = [
            (0, f"one two three {shared} four five six"),
            (1, f"{shared} seven eight nine ten eleven twelve"),
            (2, "totally unrelated words in this document here now"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r["doc_a"], r["doc_b"]) for r in
               winnow_pairs(docs, k=3, w=4, min_shared=1).collect()}
        assert (0, 1) in got
        assert all(2 not in p for p in got)

    def test_fingerprints_thinned(self, spark, docs):
        from geocube_spark.operators.passages import winnow_fingerprints
        from geocube_spark.operators.retrieval import tokens_expr

        n_fp = winnow_fingerprints(docs, k=3, w=4).count()
        n_grams = docs.select(
            F.explode(tokens_expr(F.col("text"))).alias("t")
        ).count()
        # winnowing keeps ~2/(w+1) = 40% of gram positions; allow slack
        assert n_fp < 0.6 * n_grams


class TestDistributedRankNtile:
    """The registered perplexity_buckets now ranks via distributed_rank
    (range-repartition + partitioned row_number) — it must agree with the
    literal single-window ntile BIT-FOR-BIT, and its plan must not put a
    single-partition window over doc-level rows."""

    def test_matches_exact_window_bitwise(self, docs):
        from geocube_spark.operators.retrieval import (
            perplexity_buckets,
            perplexity_buckets_exact_window,
        )

        got = {r["bucket"]: r.asDict() for r in perplexity_buckets(docs).collect()}
        want = {
            r["bucket"]: r.asDict()
            for r in perplexity_buckets_exact_window(docs).collect()
        }
        assert got == want

    def test_distributed_rank_is_dense_and_exact(self, spark):
        import random

        from geocube_spark.operators.retrieval import distributed_rank

        rng = random.Random(7)
        rows = [(f"d{i}", rng.uniform(0, 10)) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id string, mean_nll double").repartition(13)
        out = distributed_rank(df, ["mean_nll", "doc_id"]).collect()
        assert sorted(r["rnk"] for r in out) == list(range(1, 501))
        assert all(r["n"] == 500 for r in out)
        by_rank = sorted(out, key=lambda r: r["rnk"])
        keys = [(r["mean_nll"], r["doc_id"]) for r in by_rank]
        assert keys == sorted(keys)

    def test_registered_plan_has_no_global_window(self, docs):
        from geocube_spark.operators.retrieval import perplexity_buckets

        plan = (
            perplexity_buckets(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        low = plan.lower()
        assert "ntile(" not in low
        # the doc-level row_number must be PARTITIONED by _pid; the only
        # unpartitioned windows allowed are the offset cumsum/total over
        # the n_partitions-row counts dim (bounded, broadcast afterwards)
        assert "row_number() windowspecdefinition(_pid" in low
        # (the rangepartitioning exchange sits above the localCheckpoint
        # cut, so the audited plan shows only the ExistingRDD scan of the
        # checkpointed, range-partitioned rows)
