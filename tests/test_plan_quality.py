"""Plan-quality regression tests: the physical plans the engine promises in
SCALING.md, asserted against .explain output so optimizations can't silently
regress.  These are the '.explain and iterate' loop, frozen as CI."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.dataformat import cast_expr
from geocube_spark.operators.mosaic import mosaic_blocks
from geocube_spark.plans.find_datasets import DatasetFilters, find_datasets


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def fx(spark, fixture_dir):
    return {
        "datasets": spark.read.parquet(f"{fixture_dir}/datasets.parquet"),
        "records": spark.read.parquet(f"{fixture_dir}/records.parquet"),
        "tiles": spark.read.parquet(f"{fixture_dir}/tiles.parquet"),
    }


class TestFindDatasetsPlan:
    def test_status_filter_pushed_to_scan(self, fx):
        out = find_datasets(fx["datasets"], None, DatasetFilters(status="ACTIVE", order=False))
        plan = formatted_plan(out)
        assert "PushedFilters" in plan
        assert "EqualTo(status,ACTIVE)" in plan

    def test_records_join_is_broadcast(self, fx):
        from datetime import datetime

        flt = DatasetFilters(status="ACTIVE", time_from=datetime(2018, 1, 1))
        out = find_datasets(fx["datasets"], fx["records"], flt)
        assert "BroadcastHashJoin" in physical_plan(out)

    def test_join_avoidance_no_join_without_predicates(self, fx):
        out = find_datasets(
            fx["datasets"], fx["records"], DatasetFilters(status="ACTIVE", order=False)
        )
        plan = physical_plan(out)
        assert "Join" not in plan  # O5: records join elided

    def test_column_pruning_reaches_scan(self, fx):
        out = find_datasets(
            fx["datasets"], None, DatasetFilters(status="ACTIVE", order=False)
        ).select("id", "record_id")
        plan = formatted_plan(out)
        # ReadSchema carries only the needed columns, not geom_wkb/px blobs
        read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "geom_wkb" not in read_schema
        assert "id" in read_schema


class TestPixelPlanePlans:
    def test_cast_stays_jvm_side(self, fx):
        src = {
            "dtype": "Int16", "no_data": -32768.0, "min_value": 0.0, "max_value": 10000.0,
            "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0,
        }
        dst = dict(src, dtype="UInt8", no_data=0.0, min_value=1.0, max_value=255.0)
        out = fx["tiles"].select(cast_expr(F.col("px"), src, dst).alias("c"))
        plan = physical_plan(out)
        # no Python evaluation nodes: the cast runs entirely JVM-side
        # (HOF lambdas sit outside WholeStageCodegen spans by design)
        assert "EvalPython" not in plan
        assert "ReadSchema: struct<px:array<double>>" in plan  # pruned scan

    def test_mosaic_single_shuffle(self, fx, spark):
        joined = fx["tiles"].join(
            F.broadcast(
                fx["datasets"].select("container_uri", "record_id").limit(10)
            ),
            "container_uri",
        ).withColumn("record_datetime", F.current_timestamp())
        out = mosaic_blocks(joined, nodata=-32768.0)
        plan = physical_plan(out)
        # exactly one hash-partition exchange: the groupBy on block keys
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, plan[:1500]

    def test_tile_band_filter_pushed(self, fx):
        out = fx["tiles"].filter(F.col("band") == 1).select("px")
        plan = formatted_plan(out)
        assert "PushedFilters" in plan and "EqualTo(band,1)" in plan


class TestScalingClaims:
    """SCALING.md promises not yet frozen in CI (VERDICT r1 #9)."""

    def test_curation_chain_bounded_shuffles(self, spark):
        import os

        from geocube_spark.operators.pipeline import curate

        sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        out = curate(docs, min_quality=0.3, langs=["en", "de"])
        plan = physical_plan(out)
        # dedup is the only shuffle-producing step: fingerprint groupBy plus
        # the keep-first semi join — nothing else in the chain may add one
        assert plan.count("Exchange hashpartitioning") <= 3, plan[:2000]
        assert "CartesianProduct" not in plan
        # the language filter is a scan-pushable predicate
        fplan = formatted_plan(out)
        assert "PushedFilters" in fplan and "In(lang" in fplan

    def test_range_join_is_equi_join(self, spark):
        from geocube_spark.operators.asof import range_join_buckets

        left = spark.range(100).selectExpr("CAST(id % 7 AS STRING) AS k", "id * 10 AS lts")
        right = spark.range(100).selectExpr("CAST(id % 7 AS STRING) AS k", "id * 9 AS rts", "id AS payload")
        out = range_join_buckets(left, right, "k", "lts", "rts", 0.0, 100.0, ["payload"])
        plan = physical_plan(out)
        # the interval join must be the bucketed EQUI join, never an
        # inequality nested-loop or cartesian plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
            "BroadcastHashJoin" in plan
        )

    def test_asof_join_single_shuffle(self, spark):
        from geocube_spark.operators.asof import as_of_join

        left = spark.range(100).selectExpr("CAST(id % 7 AS STRING) AS k", "id * 10 AS lts")
        right = spark.range(100).selectExpr("CAST(id % 7 AS STRING) AS k", "id * 9 AS rts", "id AS v")
        out = as_of_join(left, right, "k", "lts", "rts", ["v"])
        plan = physical_plan(out)
        # union -> ONE window shuffle on the key; no join at all
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
        assert "Join" not in plan

    def test_timeseries_block_read_partition_pruned(self, spark):
        from geocube_spark.registry import ensure_consolidated

        root = ensure_consolidated(spark)
        out = (
            spark.read.parquet(root)
            .filter((F.col("cell_uri") == "0_0") & (F.col("band") == 1) & (F.col("level") == 0))
            .select("record_id", "px")
        )
        fplan = formatted_plan(out)
        # cell_uri is the physical partition column: the filter must appear
        # as a PartitionFilter (directory pruning), not a post-scan filter
        pf_line = next(l for l in fplan.splitlines() if "PartitionFilters" in l)
        assert "cell_uri" in pf_line
        # and the non-partition predicates push into the parquet scan
        assert "PushedFilters" in fplan and "EqualTo(band,1)" in fplan


class TestSimilarityPlans:
    """VERDICT r1: embedding_all_pairs_exact must never materialize
    embedding rows on the driver — it is a distributed block GEMM."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.range(64).selectExpr(
            "id AS vec_id",
            "transform(sequence(0, 7), i -> sin(cast(id * 8 + i AS DOUBLE))) AS embedding",
        )

    def test_all_pairs_exact_builds_lazily_no_collect(self, emb, monkeypatch):
        # plan CONSTRUCTION must not touch the driver: any collect/take/
        # toLocalIterator during build is the round-1 anti-pattern
        from geocube_spark.operators import similarity as sim

        cls = type(emb)  # Spark 4: the classic DataFrame subclass

        def boom(self, *a, **kw):  # pragma: no cover - should never run
            raise AssertionError("driver materialization during plan build")

        monkeypatch.setattr(cls, "collect", boom)
        monkeypatch.setattr(cls, "take", boom)
        monkeypatch.setattr(cls, "toLocalIterator", boom)
        out = sim.embedding_all_pairs_exact(emb, threshold=0.5)
        plan = physical_plan(out)
        monkeypatch.undo()
        assert "FlatMapCoGroupsInPandas" in plan  # block-pair GEMM tasks
        assert "CollectLimit" not in plan
        assert "BroadcastExchange" not in plan  # corpus is never broadcast

    def test_all_pairs_exact_no_cartesian(self, emb):
        from geocube_spark.operators import similarity as sim

        plan = physical_plan(sim.embedding_all_pairs_exact(emb, threshold=0.5))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_kmeans_collect_is_bounded(self, emb, monkeypatch):
        # the quantizer's driver transfer must carry a GlobalLimit, whatever
        # the table size (round-1 default collected the full corpus).  The
        # sample now rides the Arrow path (toPandas, guide §6), so the spy
        # covers BOTH driver-transfer methods — whichever fires must be
        # limit-bounded.
        from geocube_spark.operators import similarity as sim

        cls = type(emb)
        seen = []

        def make_spy(orig):
            def spying(self, *a, **kw):
                # analyzed plan: the optimizer elides the limit when the
                # table is statically smaller than the cap, but it must be
                # DECLARED
                seen.append(self._jdf.queryExecution().analyzed().toString())
                return orig(self, *a, **kw)

            return spying

        monkeypatch.setattr(cls, "collect", make_spy(cls.collect))
        monkeypatch.setattr(cls, "toPandas", make_spy(cls.toPandas))
        sim.kmeans_centroids(emb, k=4)
        monkeypatch.undo()
        assert seen and all("GlobalLimit" in p for p in seen)


class TestCatalogHotPathPlans:
    """The three plans a 100x catalog leans on hardest (VERDICT r5 item
    10): pixel assembly (get_cube_pixels), the latest-wins mosaic, and
    consolidation planning — pushdown reaching the scans, dims broadcast,
    fact side never broadcast."""

    def _q(self, spark, name):
        from geocube_spark import registry

        return registry.queries()[name](spark, "/root/testdata/sf0.001")

    def test_get_cube_pixels_pushdown_and_broadcast(self, spark):
        df = self._q(spark, "get_cube_pixels")
        fmt = formatted_plan(df)
        phys = physical_plan(df)
        # level filter pushed to the TILE scan, status filter to datasets
        assert "EqualTo(level,0)" in fmt
        assert "EqualTo(status,ACTIVE)" in fmt
        # dims broadcast; no shuffled fact-fact join, no BNLJ
        assert "BroadcastHashJoin" in phys
        assert "BroadcastNestedLoopJoin" not in phys
        assert "CartesianProduct" not in phys

    def test_overview_auto_level_pruned_at_scan(self, spark):
        # O8: the auto-selected overview level is a driver literal, so the
        # level-partitioned pyramid store is pruned to ONE level directory
        df = self._q(spark, "get_cube_overview_auto")
        fmt = formatted_plan(df)
        pf_line = next(
            line for line in fmt.splitlines() if "PartitionFilters" in line
        )
        assert "level" in pf_line and "1" in pf_line
        # the finer level never reaches the plan: only one level scanned
        assert "EqualTo(level,0)" not in fmt

    def test_mosaic_latest_first_pushdown_and_broadcast(self, spark):
        df = self._q(spark, "mosaic_latest_first")
        fmt = formatted_plan(df)
        phys = physical_plan(df)
        assert "EqualTo(level,0)" in fmt  # pushed through the join
        assert "BroadcastHashJoin" in phys
        assert "BroadcastNestedLoopJoin" not in phys
        # the latest-wins struct-max aggregation is ONE shuffle over the
        # tile table (partial_max map-side)
        assert phys.count("Exchange hashpartitioning") <= 2

    def test_consolidation_planning_pushdown(self, spark, fixture_dir):
        from geocube_spark.operators.consolidation import plan_consolidation
        from geocube_spark.operators.cover import RegularGridSpec

        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        records = spark.read.parquet(f"{fixture_dir}/records.parquet")
        spec = RegularGridSpec(crs="epsg:4326", cell_size=400, resolution=0.01)
        plan = plan_consolidation(datasets, records, "job-0", spec, max_records=3)
        fmt = formatted_plan(plan)
        phys = physical_plan(plan)
        # the job-lock filter reaches the datasets scan (F11)
        assert "EqualTo(locked_by_job_id,job-0)" in fmt
        # record times and the cell list are broadcast dims
        assert "BroadcastHashJoin" in phys or "BroadcastNestedLoopJoin" in phys
        assert "CartesianProduct" not in phys
