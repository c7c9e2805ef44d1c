"""Bloom-filter decontamination: no-false-negative guarantee, filter
membership on the eval grams themselves, and plan shape (broadcast probe
join, no cartesian)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from geocube_spark.operators.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    _grams,
    _pos_expr,
    bloom_decontamination_report,
    bloom_words,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

def _eval_pred():
    return F.col("doc_id") % 19 == 3


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def report(docs):
    rows = bloom_decontamination_report(docs, _eval_pred(), n=8).collect()
    assert rows, "report should not be empty"
    return rows


class TestBloomDecontamination:
    def test_no_false_negatives(self, report):
        # bloom ⊇ exact in every source bucket, and the gap is the FP count
        for r in report:
            assert r["n_bloom"] >= r["n_exact"] >= 0
            assert r["n_false_pos"] == r["n_bloom"] - r["n_exact"]
            assert r["n_train"] >= r["n_bloom"]

    def test_exact_hits_exist(self, report):
        # the synthetic corpus shares vocabulary across docs — at least one
        # source bucket must show true contamination, else the fixture
        # exercises nothing
        assert sum(r["n_exact"] for r in report) > 0

    def test_eval_grams_all_hit_filter(self, docs):
        """Probing the filter with the very grams that built it must hit on
        every one of the k positions — the membership guarantee."""
        g = _grams(docs.withColumn("is_eval", _eval_pred()), 8, "text")
        eval_g = g.filter("is_eval").select("g").distinct()
        words = bloom_words(eval_g)
        seeds = F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("seed")
        probes = (
            eval_g.select("g", seeds)
            .select("g", _pos_expr(F.col("g"), F.col("seed"), BLOOM_M_BITS).alias("pos"))
            .select(
                "g",
                F.expr("pos DIV 32").alias("word"),
                (F.col("pos") % 32).cast("int").alias("bit"),
            )
        )
        misses = (
            probes.join(words, "word", "left")
            .withColumn(
                "hit",
                F.when(
                    F.col("bits").isNotNull(),
                    F.expr("CAST(shiftright(bits, bit) & 1 AS INT)"),
                ).otherwise(F.lit(0)),
            )
            .filter(F.col("hit") == 0)
            .count()
        )
        assert misses == 0

    def test_plan_shape(self, docs):
        plan = bloom_decontamination_report(docs, _eval_pred(), n=8)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
