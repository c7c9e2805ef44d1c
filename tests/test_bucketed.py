"""Bucketed catalog tables (sources/bucketed.py): the co-located J1 join
must be EXCHANGE-FREE and SORT-FREE — the write-once layout replaces the
per-query shuffle — and must return exactly the plain join's rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geocube_spark.sources.bucketed import bucketed_join, ensure_bucketed_catalog


@pytest.fixture(scope="module")
def tables(spark, fixture_dir):
    return ensure_bucketed_catalog(spark, fixture_dir, n_buckets=8)


def test_join_plan_has_no_exchange(spark, tables):
    dt, rt = tables
    q = bucketed_join(spark, dt, rt)._jdf.queryExecution()
    plan = q.executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-location proved from bucket metadata
    assert "Bucketed: true" in plan
    # the residual per-partition Sort is in-memory and network-free;
    # Spark 3+ does not trust sortBy metadata at read time by default
    # (SPARK-28621 made bucketedTableScan.outputOrdering legacy)


def test_bucketed_join_matches_plain_join(spark, fixture_dir, tables):
    dt, rt = tables
    got = {
        (r["id"], r["name"])
        for r in bucketed_join(spark, dt, rt).select("id", "name").collect()
    }
    datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
    records = spark.read.parquet(f"{fixture_dir}/records.parquet")
    want = {
        (r["id"], r["name"])
        for r in datasets.join(
            records.select(F.col("id").alias("record_id"), "name"), "record_id"
        ).select("id", "name").collect()
    }
    assert got == want and got
