"""Greedy k-center sampling: monotone separation distances, distinct
picks, and the 2-approx coverage property (every point within the last
selection's sep_dist of some center)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.vectors import cosine_expr
from geocube_spark.operators.diversity import _vec_lit, kcenter_sample

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

K = 6


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


@pytest.fixture(scope="module")
def picks(spark, emb):
    return kcenter_sample(spark, emb, k=K).collect()


class TestKCenter:
    def test_shape_and_distinct(self, picks):
        assert len(picks) == K
        assert [r["rank"] for r in picks] == list(range(K))
        assert len({r["vec_id"] for r in picks}) == K

    def test_monotone_separation(self, picks):
        # greedy picks the farthest remaining point each round, so the
        # separation sequence never increases after round 1
        seps = [r["sep_dist"] for r in picks[1:]]
        assert all(a >= b - 1e-9 for a, b in zip(seps, seps[1:]))
        assert all(s > 0 for s in seps)

    def test_coverage_radius(self, spark, emb, picks):
        # every point lies within the LAST pick's sep_dist of a chosen
        # center (if anything were farther, greedy would have picked it)
        centers = emb.filter(
            F.col("vec_id").isin([r["vec_id"] for r in picks])
        ).collect()
        mind = None
        for c in centers:
            d = 1 - cosine_expr(F.col("embedding"), _vec_lit(c["embedding"]))
            mind = d if mind is None else F.least(mind, d)
        radius = picks[-1]["sep_dist"]
        n_outside = emb.filter(mind > radius + 1e-6).count()
        assert n_outside == 0
