"""Materialized views: version pinning, metadata-only staleness, strict /
cached / auto read modes, and time travel to the previous
materialization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geocube_spark.sources.catalog import Catalog
from geocube_spark.sources.matview import (
    create_materialized_view,
    read_materialized_view,
    view_staleness,
)


def _builder(cat):
    return (
        cat.read("base")
        .groupBy("k")
        .agg(F.sum("v").cast("long").alias("total"))
    )


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "cat"), retain_versions=4)
    c.write("base", spark.createDataFrame([(1, 10), (1, 5), (2, 7)], "k int, v int"))
    return c


class TestMaterializedView:
    def test_create_and_fresh_read(self, cat):
        v = create_materialized_view(cat, "mv", _builder, ["base"])
        assert v == 1
        st = view_staleness(cat, "mv")
        assert st["fresh"] and st["pinned"] == {"base": 1}
        got = {r["k"]: r["total"] for r in read_materialized_view(cat, "mv").collect()}
        assert got == {1: 15, 2: 7}

    def test_dep_write_makes_stale(self, cat, spark):
        create_materialized_view(cat, "mv", _builder, ["base"])
        cat.write("base", spark.createDataFrame([(1, 100)], "k int, v int"))
        st = view_staleness(cat, "mv")
        assert not st["fresh"] and st["stale_deps"] == ["base"]
        # cached still serves the OLD materialization
        got = {r["k"]: r["total"] for r in read_materialized_view(cat, "mv").collect()}
        assert got == {1: 15, 2: 7}
        with pytest.raises(RuntimeError, match="stale"):
            read_materialized_view(cat, "mv", mode="strict")

    def test_auto_refresh_repins(self, cat, spark):
        create_materialized_view(cat, "mv", _builder, ["base"])
        cat.write("base", spark.createDataFrame([(3, 1)], "k int, v int"))
        got = {
            r["k"]: r["total"]
            for r in read_materialized_view(cat, "mv", _builder, mode="auto").collect()
        }
        assert got == {3: 1}
        st = view_staleness(cat, "mv")
        assert st["fresh"] and st["pinned"] == {"base": 2}
        # the previous materialization is still time-travel readable
        old = {r["k"]: r["total"] for r in cat.read("mv", version=1).collect()}
        assert old == {1: 15, 2: 7}

    def test_non_view_raises(self, cat):
        with pytest.raises(FileNotFoundError, match="not a materialized view"):
            view_staleness(cat, "base")
