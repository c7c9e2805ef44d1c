"""Count-min sketch: one-sided error theorem, bounded state, and
mergeability (cells built on disjoint halves sum to the full-corpus
cells)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from geocube_spark.operators.retrieval import tokens_expr
from geocube_spark.operators.sketches import (
    CM_DEPTH,
    CM_WIDTH,
    countmin_accuracy,
    countmin_cells,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def terms(docs):
    return docs.select(F.explode(tokens_expr(F.col("text"))).alias("term"))


class TestCountMin:
    def test_never_undercounts(self, terms):
        # est >= true for EVERY distinct term (counters only add) — the
        # one-sided error guarantee, checked over the whole vocabulary
        rows = countmin_accuracy(terms, top=10_000).collect()
        assert rows
        for r in rows:
            assert r["est_cnt"] >= r["true_cnt"]
            assert r["overcount"] == r["est_cnt"] - r["true_cnt"]

    def test_bounded_state(self, terms):
        assert countmin_cells(terms).count() <= CM_DEPTH * CM_WIDTH

    def test_mergeable(self, terms, spark):
        """Sketches are mergeable by cell addition: sketch(A) + sketch(B)
        == sketch(A ∪ B) when A, B partition the stream."""
        with_id = terms.withColumn("i", F.monotonically_increasing_id())
        a = countmin_cells(with_id.filter(F.col("i") % 2 == 0))
        b = countmin_cells(with_id.filter(F.col("i") % 2 == 1))
        merged = (
            a.unionByName(b)
            .groupBy("seed", "bucket")
            .agg(F.sum("c").alias("c"))
        )
        full = countmin_cells(terms)
        diff = (
            merged.join(full, ["seed", "bucket"], "full")
            .filter(
                F.coalesce(merged["c"], F.lit(0)) != F.coalesce(full["c"], F.lit(0))
            )
            .count()
        )
        assert diff == 0

    def test_heavy_terms_small_relative_error(self, terms):
        # for the top-20 heavy hitters the relative overcount should be
        # modest at this corpus size (eN/w with e ~ 2.7, w = 256)
        n = terms.count()
        rows = countmin_accuracy(terms, top=20).collect()
        bound = 3.0 * n / CM_WIDTH
        for r in rows:
            assert r["overcount"] <= bound


class TestCountMinRandomCorpora:
    def test_one_sided_error_random(self, spark):
        # the est >= true theorem must hold on any corpus, not just the
        # fixture vocabulary
        import numpy as np

        for seed in (11, 47):
            rng = np.random.RandomState(seed)
            zipf = rng.zipf(1.5, size=3000)
            rows = [(f"w{int(v) % 200}",) for v in zipf]
            t = spark.createDataFrame(rows, "term string")
            for r in countmin_accuracy(t, top=500).collect():
                assert r["est_cnt"] >= r["true_cnt"], f"seed {seed}"
