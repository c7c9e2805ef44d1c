"""k-anonymity ladder: chosen-level selection and the suppression
fallback when even the coarsest rung leaves sub-k groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geocube_spark.operators.pii import k_anonymity_report


def _df(spark, rows):
    return spark.createDataFrame(rows, "g1 string, g2 string")


class TestKAnonymity:
    def test_picks_finest_anonymous_level(self, spark):
        # level 0: groups of 3+3 (k=2 ok) -> chosen immediately
        rows = [("a", "x")] * 3 + [("b", "y")] * 3
        rep = k_anonymity_report(
            _df(spark, rows), 2, [("fine", F.col("g1")), ("coarse", F.lit("all"))]
        ).collect()
        chosen = [r for r in rep if r["chosen"] == 1]
        assert len(chosen) == 1 and chosen[0]["level"] == 0
        assert chosen[0]["n_suppressed_rows"] == 0

    def test_escalates_past_small_groups(self, spark):
        # level 0 has a singleton group -> must escalate to level 1
        rows = [("a", "x")] * 5 + [("b", "x")]
        rep = k_anonymity_report(
            _df(spark, rows), 2, [("fine", F.col("g1")), ("coarse", F.col("g2"))]
        ).collect()
        chosen = [r for r in rep if r["chosen"] == 1][0]
        assert chosen["level"] == 1
        assert chosen["min_group_size"] == 6

    def test_suppression_fallback(self, spark):
        # even the coarsest level keeps a sub-k group -> coarsest is chosen
        # and its small rows are counted as suppressed
        rows = [("a", "x")] * 5 + [("b", "y")]
        rep = k_anonymity_report(
            _df(spark, rows), 3, [("fine", F.col("g1")), ("coarse", F.col("g2"))]
        ).collect()
        chosen = [r for r in rep if r["chosen"] == 1][0]
        assert chosen["level"] == 1
        assert chosen["n_suppressed_rows"] == 1
        assert chosen["n_small_groups"] == 1
