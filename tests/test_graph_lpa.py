"""Label propagation: structural behavior on crafted graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geocube_spark.operators.graph import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


class TestLPA:
    def test_two_cliques_two_communities(self, spark):
        tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
        tri2 = [("x", "y"), ("y", "z"), ("x", "z")]
        out = label_propagation(_edges(spark, tri1 + tri2), iterations=5).collect()
        labels = {r["node"]: r["label"] for r in out}
        assert labels["a"] == labels["b"] == labels["c"] == "a"
        assert labels["x"] == labels["y"] == labels["z"] == "x"

    def test_bridge_does_not_merge_cliques(self, spark):
        # two triangles joined by one bridge edge: each side's internal
        # majority outweighs the single cross label
        e = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
        out = label_propagation(_edges(spark, e), iterations=5).collect()
        labels = {r["node"]: r["label"] for r in out}
        assert len({labels["a"], labels["x"]}) == 2

    def test_isolated_node_keeps_label(self, spark):
        out = label_propagation(
            _edges(spark, [("a", "b"), ("c", "c")]), iterations=3
        ).collect()
        labels = {r["node"]: r["label"] for r in out}
        assert labels["c"] == "c"

    def test_deterministic(self, spark):
        e = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("b", "d")]
        r1 = sorted(map(tuple, label_propagation(_edges(spark, e), 4).collect()))
        r2 = sorted(map(tuple, label_propagation(_edges(spark, e), 4).collect()))
        assert r1 == r2
