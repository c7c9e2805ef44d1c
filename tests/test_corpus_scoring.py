"""Round-5 corpus-scoring operators: interpolated bigram LM, DSIR
importance weights, SemDeDup — DuckDB oracle parity at sf0.001 plus the
edge cases the oracle fixtures can't reach (single-token docs, empty
target slices, singleton clusters)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from geocube_spark.operators.pipeline import dsir_importance, dsir_importance_sql
from geocube_spark.operators.retrieval import bigram_logprob, bigram_logprob_sql
from geocube_spark.operators.similarity import semantic_dedup

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestBigramLM:
    def test_matches_duckdb_oracle(self, docs, duck):
        got = {
            r["doc_id"]: (r["n_scored"], r["mean_nll"])
            for r in bigram_logprob(docs, lam=0.8).collect()
        }
        want = {
            d: (n, m)
            for d, n, m in duck.sql(bigram_logprob_sql(lam=0.8)).fetchall()
        }
        assert got == want

    def test_single_token_doc_scored_by_unigram_only(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha"), (2, "alpha beta alpha")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
        # doc 1 has one token -> exactly one scored position (the unigram)
        assert rows[1]["n_scored"] == 1
        # doc 2: first token + 2 bigram positions
        assert rows[2]["n_scored"] == 3

    def test_empty_doc_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "!!!"), (2, "a b")], "doc_id long, text string"
        )
        ids = {r["doc_id"] for r in bigram_logprob(df).collect()}
        assert ids == {2}

    def test_repeated_corpus_lower_nll(self, spark):
        # a doc made of the corpus's dominant bigram scores lower NLL than
        # a doc of rare transitions
        rows = [(i, "the cat sat") for i in range(20)] + [(99, "zap qux")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["mean_nll"] for r in bigram_logprob(df).collect()}
        assert out[0] < out[99]


class TestDSIR:
    def test_matches_duckdb_oracle(self, docs, duck):
        pred = (F.col("source") == "src0") & (F.col("lang") == "en")
        got = {
            r["doc_id"]: (r["n_features"], r["log_weight"])
            for r in dsir_importance(docs, pred, n_buckets=64).collect()
        }
        want = {
            d: (n, w)
            for d, n, w in duck.sql(
                dsir_importance_sql("source = 'src0' AND lang = 'en'", n_buckets=64)
            ).fetchall()
        }
        assert got == want

    def test_target_docs_rank_higher_on_average(self, docs):
        pred = F.col("source") == "src0"
        out = dsir_importance(docs, pred).join(
            docs.select("doc_id", "source"), "doc_id"
        )
        avg = {
            r["t"]: r["w"]
            for r in out.groupBy((F.col("source") == "src0").alias("t"))
            .agg(F.avg("log_weight").alias("w"))
            .collect()
        }
        assert avg[True] > avg[False]

    def test_empty_target_slice_is_uniform_prior(self, spark):
        # no target rows -> p_T is the pure Laplace prior; weights must
        # still be finite (the +1 smoothing guards the log)
        df = spark.createDataFrame(
            [(1, "a b c", "x"), (2, "d e f", "x")],
            "doc_id long, text string, source string",
        )
        rows = dsir_importance(df, F.col("source") == "nope").collect()
        assert len(rows) == 2
        assert all(r["log_weight"] is not None for r in rows)


class TestSemDeDup:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )

    def test_keep_lowest_id_within_cluster(self, spark):
        e = self._emb(
            spark,
            [
                (1, [1.0, 0.0], 0),
                (2, [1.0, 0.0], 0),   # dup of 1 (same cluster)
                (3, [0.0, 1.0], 0),   # orthogonal -> kept
                (4, [1.0, 0.0], 1),   # same vector, OTHER cluster -> kept
            ],
        )
        out = {r["vec_id"]: r["is_dup"] for r in semantic_dedup(e, threshold=0.97).collect()}
        assert out == {1: False, 2: True, 3: False, 4: False}

    def test_singleton_cluster_never_dup(self, spark):
        e = self._emb(spark, [(7, [1.0, 2.0], 5)])
        rows = semantic_dedup(e).collect()
        assert rows[0]["is_dup"] is False

    def test_chain_dedup_keeps_only_first(self, spark):
        # 3 mutually-similar vectors: only the lowest id survives
        e = self._emb(
            spark,
            [(i, [1.0, float(i) * 1e-4], 0) for i in (10, 11, 12)],
        )
        out = {r["vec_id"]: r["is_dup"] for r in semantic_dedup(e, threshold=0.99).collect()}
        assert out == {10: False, 11: True, 12: True}

    def test_blocking_matches_unblocked(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        rows = [
            (int(i), (rng.standard_normal(8)).tolist(), int(i % 3))
            for i in range(60)
        ]
        e = self._emb(spark, rows)
        a = {
            (r["vec_id"], r["is_dup"])
            for r in semantic_dedup(e, threshold=0.5, block_rows=7).collect()
        }
        b = {
            (r["vec_id"], r["is_dup"])
            for r in semantic_dedup(e, threshold=0.5, block_rows=4096).collect()
        }
        assert a == b


class TestBroveyPansharpen:
    def test_ratio_algebra_and_zero_guard(self, spark):
        from geocube_spark.operators.algebra import pansharpen_brovey

        df = spark.createDataFrame(
            [([3.0, 0.0], [6.0, 0.0], [9.0, 0.0], [12.0, 5.0])],
            "r array<double>, g array<double>, b array<double>, pan array<double>",
        )
        row = pansharpen_brovey(df, "r", "g", "b", "pan").first()
        # intensity = (3+6+9)/3 = 6, ratio = 12/6 = 2
        assert row["sharp_r"] == [6.0, 0.0]
        assert row["sharp_g"] == [12.0, 0.0]
        assert row["sharp_b"] == [18.0, 0.0]  # zero intensity -> 0, no NaN


class TestHistogramEqualize:
    def test_hand_computed_small_case(self, spark):
        from geocube_spark.operators.algebra import histogram_equalize

        df = spark.createDataFrame(
            [(0, [0.0, 0.0, 1.0, 2.0, 3.0, 3.0, 3.0, 3.0])],
            "block int, px array<double>",
        )
        out = histogram_equalize(df, bins=4, vmin=0.0, vmax=4.0).first()
        # hist 2/1/1/4, cdf 2/3/4/8, cdf_min=2, N=8:
        # eq = round((cdf-2)/6*3) -> 0, 1 (0.5 rounds up), 1, 3
        assert out["px_eq"] == [0.0, 0.0, 1.0, 1.0, 3.0, 3.0, 3.0, 3.0]

    def test_constant_image_maps_to_zero(self, spark):
        from geocube_spark.operators.algebra import histogram_equalize

        df = spark.createDataFrame(
            [(0, [5.0] * 8)], "block int, px array<double>"
        )
        out = histogram_equalize(df, bins=16, vmin=0.0, vmax=16.0).first()
        assert out["px_eq"] == [0.0] * 8

    def test_full_range_spread(self, spark):
        from geocube_spark.operators.algebra import histogram_equalize

        # already-uniform values equalize onto the full [0, bins-1] range
        df = spark.createDataFrame(
            [(0, [float(i) for i in range(16)])], "block int, px array<double>"
        )
        out = histogram_equalize(df, bins=16, vmin=0.0, vmax=16.0).first()
        assert out["px_eq"][0] == 0.0
        assert out["px_eq"][-1] == 15.0
        assert out["px_eq"] == sorted(out["px_eq"])


class TestKneserNey:
    def test_matches_duckdb_oracle(self, docs, duck):
        from geocube_spark.operators.retrieval import (
            kneser_ney_logprob,
            kneser_ney_logprob_sql,
        )

        got = {
            r["doc_id"]: (r["n_scored"], r["mean_nll"])
            for r in kneser_ney_logprob(docs).collect()
        }
        want = {
            d: (n, m)
            for d, n, m in duck.sql(kneser_ney_logprob_sql()).fetchall()
        }
        assert got == want

    def test_continuation_probability_effect(self, spark):
        from geocube_spark.operators.retrieval import kneser_ney_logprob

        # 'of the' is frequent but 'the' follows MANY contexts, while
        # 'francisco' only ever follows 'san' — the classic KN example:
        # a doc pairing 'san' with a NEW continuation is penalized more
        # than frequency alone would suggest.  Here: token 'b' follows
        # many contexts, token 'z' only one; p_cont(b) >> p_cont(z).
        rows = [(i, f"w{i} b") for i in range(10)] + [(90, "q z"), (91, "q z")]
        # scored doc: same left context 'q', continuations b vs z
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = kneser_ney_logprob(df).collect()
        assert all(r["mean_nll"] is not None for r in out)

    def test_finite_scores_on_own_corpus(self, spark):
        import math

        from geocube_spark.operators.retrieval import kneser_ney_logprob

        df = spark.createDataFrame(
            [(1, "a b a c"), (2, "b a"), (3, "c")], "doc_id long, text string"
        )
        for r in kneser_ney_logprob(df).collect():
            assert math.isfinite(r["mean_nll"])


class TestHardNegatives:
    def test_excludes_same_label_and_ranks(self, spark):
        from geocube_spark.operators.similarity import hard_negatives

        e = spark.createDataFrame(
            [
                (0, [1.0, 0.0], 0),          # anchor
                (1, [0.99, 0.1], 0),         # same label: excluded
                (2, [0.9, 0.2], 1),          # hardest negative
                (3, [0.0, 1.0], 1),          # easy negative
                (4, [0.8, 0.3], 2),          # second-hardest
            ],
            "vec_id long, embedding array<double>, label int",
        )
        rows = hard_negatives(e, F.col("vec_id") == 0, k=2).collect()
        assert [(r["negative_id"], r["rank"]) for r in rows] == [(2, 1), (4, 2)]
        assert all(r["anchor_id"] == 0 for r in rows)

    def test_anchor_never_its_own_negative(self, spark):
        from geocube_spark.operators.similarity import hard_negatives

        e = spark.createDataFrame(
            [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 1)],
            "vec_id long, embedding array<double>, label int",
        )
        rows = hard_negatives(e, F.col("vec_id").isin(0, 1), k=3).collect()
        for r in rows:
            assert r["anchor_id"] != r["negative_id"]


class TestFrequentItems:
    """MG/lossy-count sketch: no false negatives above N/k, estimates
    bounded, adversarial uniform tail does not evict true heavy hitters."""

    def test_adversarial_stream_keeps_heavy(self, spark):
        from geocube_spark.operators.sketches import heavy_hitter_candidates

        # 2 heavy terms (1200 each) drowned in 6000 singletons, shuffled
        # deterministically across partitions
        rows = [("hot_a",)] * 1200 + [("hot_b",)] * 1200 + [
            (f"u{i}",) for i in range(6000)
        ]
        terms = spark.createDataFrame(rows, "term string").repartition(8, "term")
        k = 50
        n = len(rows)
        cands = {r["term"]: r["est"] for r in heavy_hitter_candidates(terms, k).collect()}
        assert "hot_a" in cands and "hot_b" in cands
        # est <= true, deficit <= N/(k+1)
        for t, true in (("hot_a", 1200), ("hot_b", 1200)):
            assert cands[t] <= true
            assert (true - cands[t]) * (k + 1) <= n

    def test_summaries_never_shuffle_stream(self, spark):
        from geocube_spark.operators.sketches import heavy_hitter_candidates

        terms = spark.createDataFrame([("x",)] * 100, "term string")
        plan = (
            heavy_hitter_candidates(terms, 10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # exactly one exchange: the summary merge (hashpartition by term)
        assert plan.count("Exchange") <= 2  # merge agg partial+final pair
