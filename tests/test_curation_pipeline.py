"""Curation pipeline composition: deterministic sampling, stratified
rebalancing, quality-gated dedup chain, budget accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geocube_spark.operators.pipeline import (
    curate,
    dedup_report,
    deterministic_sample_expr,
    stratified_sample,
    token_budget_report,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestDeterministicSample:
    def test_reproducible(self, corpus):
        a = {r["doc_id"] for r in corpus.filter(deterministic_sample_expr(F.col("doc_id"), 0.3)).collect()}
        b = {r["doc_id"] for r in corpus.filter(deterministic_sample_expr(F.col("doc_id"), 0.3)).collect()}
        assert a == b and len(a) > 0

    def test_fraction_monotone(self, corpus):
        small = corpus.filter(deterministic_sample_expr(F.col("doc_id"), 0.1)).count()
        big = corpus.filter(deterministic_sample_expr(F.col("doc_id"), 0.5)).count()
        n = corpus.count()
        assert small < big < n
        # ±50% tolerance around the target fraction at this corpus size
        assert 0.05 * n < small < 0.2 * n

    def test_subset_property(self, corpus):
        """A smaller fraction's sample is a SUBSET of a larger one — the
        property that makes scaling a pipeline down/up consistent."""
        small = {r["doc_id"] for r in corpus.filter(deterministic_sample_expr(F.col("doc_id"), 0.1)).collect()}
        big = {r["doc_id"] for r in corpus.filter(deterministic_sample_expr(F.col("doc_id"), 0.5)).collect()}
        assert small <= big


class TestStratified:
    def test_per_stratum_fractions(self, corpus):
        out = stratified_sample(corpus, "lang", {"en": 1.0, "de": 0.0})
        langs = {r["lang"] for r in out.select("lang").distinct().collect()}
        assert langs == {"en"}  # de fraction 0 -> dropped; others not listed


class TestCurationChain:
    def test_chain_and_budget(self, corpus):
        curated = curate(corpus, min_quality=0.4, langs=["en", "de"])
        rows = curated.collect()
        assert all(r["quality"] >= 0.4 for r in rows)
        assert {r["lang"] for r in rows} <= {"en", "de"}
        report = {r["lang"]: r for r in token_budget_report(curated).collect()}
        for lang, r in report.items():
            assert r["total_tokens"] > 0 and r["avg_tokens"] > 0
            docs_of_lang = [x for x in rows if x["lang"] == lang]
            assert r["n_docs"] == len(docs_of_lang)

    def test_single_plan_no_intermediate_python(self, corpus):
        curated = curate(corpus, min_quality=0.4)
        plan = curated._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan  # whole chain stays JVM-side

    def test_dedup_report_consistency(self, corpus):
        r = dedup_report(corpus).first()
        assert r["n_docs"] == corpus.count()
        assert r["n_docs"] == r["n_unique"] + r["n_duplicates"]


class TestMixtureZeroRowSource:
    def test_weighted_but_empty_source_forces_zero_total(self, spark):
        """A source present in weights with NO rows makes the achievable
        total 0 (nothing can be kept without upsampling it) — it must not
        be silently ignored, and the report keeps every source row with
        n_kept = 0."""
        from geocube_spark.operators.pipeline import (
            mixture_report,
            mixture_resample,
        )

        docs = spark.createDataFrame(
            [(i, "src0" if i % 2 else "src1") for i in range(40)],
            "doc_id LONG, source STRING",
        )
        weights = {"src0": 1, "src1": 1, "ghost": 2}
        assert mixture_resample(docs, weights).count() == 0
        rep = {
            r["source"]: (r["n_before"], r["n_kept"])
            for r in mixture_report(docs, weights).collect()
        }
        assert rep["src0"][1] == 0 and rep["src1"][1] == 0
        assert rep["src0"][0] == 20  # before-counts survive the left join

    def test_all_sources_present_unchanged(self, spark):
        from geocube_spark.operators.pipeline import mixture_report

        docs = spark.createDataFrame(
            [(i, f"src{i % 2}") for i in range(256)],
            "doc_id LONG, source STRING",
        )
        rep = {
            r["source"]: r for r in mixture_report(docs, {"src0": 1, "src1": 1}).collect()
        }
        # balanced corpus + equal weights: nearly everything kept
        assert rep["src0"]["n_kept"] > 0 and rep["src1"]["n_kept"] > 0


class TestWeightedSample:
    def test_higher_weight_higher_inclusion(self, spark):
        """Statistical sanity: with weight 10 vs 1 on two halves of the key
        space, the heavy half dominates the sample."""
        from pyspark.sql import functions as F

        from geocube_spark.operators.pipeline import weighted_sample

        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 1000, 10.0).otherwise(1.0).alias("w"),
        )
        out = weighted_sample(df, F.col("w"), n=200)
        heavy = out.filter(F.col("doc_id") < 1000).count()
        assert heavy > 140  # E[heavy] ~ 181 of 200

    def test_deterministic_across_layouts(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.operators.pipeline import weighted_sample

        df = spark.range(500).select(
            F.col("id").alias("doc_id"), (F.col("id") % 7 + 1.0).alias("w")
        )
        a = {r["doc_id"] for r in weighted_sample(df, F.col("w"), 50).collect()}
        b = {
            r["doc_id"]
            for r in weighted_sample(df.repartition(13), F.col("w"), 50).collect()
        }
        assert a == b

    def test_nonpositive_weights_dropped(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.operators.pipeline import weighted_sample

        df = spark.range(10).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 5, -1.0).otherwise(1.0).alias("w"),
        )
        out = weighted_sample(df, F.col("w"), n=10)
        assert out.filter(F.col("doc_id") < 5).count() == 0


class TestCurriculumShards:
    def test_shards_monotone_and_balanced(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.operators.pipeline import curriculum_shards

        df = spark.range(1000).select(
            F.col("id").alias("doc_id"), (F.col("id") * 3 % 997).cast("double").alias("d")
        )
        rows = curriculum_shards(df, F.col("d"), n_shards=10).collect()
        assert [r["shard"] for r in rows] == list(range(1, 11))
        assert all(r["n_docs"] == 100 for r in rows)
        # difficulty spans are non-overlapping and increasing
        for a, b in zip(rows, rows[1:]):
            assert a["max_difficulty"] <= b["min_difficulty"]

    def test_nondivisible_allocation_matches_ntile(self, spark, duck):
        """103 rows / 10 shards: ntile gives the first 3 shards 11 rows —
        the distributed exact-ntile must replicate that allocation."""
        from pyspark.sql import functions as F

        from geocube_spark.operators.pipeline import curriculum_shards

        df = spark.createDataFrame(
            [(i, float(i * 7 % 101)) for i in range(103)],
            "doc_id long, d double",
        )
        got = [
            (r["shard"], r["n_docs"])
            for r in curriculum_shards(df, F.col("d"), n_shards=10).collect()
        ]
        want = duck.sql(
            "SELECT shard, CAST(count(*) AS BIGINT) FROM ("
            " SELECT ntile(10) OVER (ORDER BY d, doc_id) AS shard FROM ("
            "  SELECT range AS doc_id, CAST(range * 7 % 101 AS DOUBLE) AS d"
            "  FROM range(0, 103)))"
            " GROUP BY shard ORDER BY shard"
        ).fetchall()
        assert got == [tuple(w) for w in want]
        assert [n for _, n in got[:3]] == [11, 11, 11]

    def test_fewer_rows_than_shards(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.operators.pipeline import curriculum_shards

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(4)], "doc_id long, d double"
        )
        rows = curriculum_shards(df, F.col("d"), n_shards=10).collect()
        assert [(r["shard"], r["n_docs"]) for r in rows] == [
            (1, 1), (2, 1), (3, 1), (4, 1)
        ]
