"""Consolidation end-to-end: plan -> rewrite -> swap -> re-read equivalence
(the reference's handler_consolidation_test analogue, table-shaped), plus
ingest validation (S4) and chunk/compress utils (S8/C12/L2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geocube_spark.operators.consolidation import (
    consolidate_tiles,
    plan_consolidation,
    swap_datasets,
)
from geocube_spark.operators.cover import RegularGridSpec
from geocube_spark.operators.mosaic import mosaic_blocks
from geocube_spark.sources.ingest import (
    chunk_bytes,
    compress_chunks,
    decompress_chunks,
    validate_datasets_against_tiles,
)


class TestConsolidationEndToEnd:
    def test_plan_rewrite_swap_preserves_reads(self, spark, fixture_dir, tmp_path):
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        records = spark.read.parquet(f"{fixture_dir}/records.parquet")
        tiles = spark.read.parquet(f"{fixture_dir}/tiles.parquet")

        # 1. PLAN: cells + chunked task list for the locked job
        spec = RegularGridSpec(crs="epsg:4326", cell_size=400, resolution=0.01)
        plan = plan_consolidation(datasets, records, "job-0", spec, max_records=4)
        tasks = plan.collect()
        assert len(tasks) > 0

        # 2. REWRITE: tiles of the planned datasets -> partitioned, sorted
        planned_ids = {m["dataset_id"] for t in tasks for m in t["datasets"]}
        cell_of = {
            m["container_uri"]: t["cell_uri"] for t in tasks for m in t["datasets"]
        }
        cell_map = spark.createDataFrame(
            list(cell_of.items()), "container_uri STRING, cell_uri STRING"
        )
        job_tiles = (
            tiles.join(F.broadcast(cell_map), "container_uri")
            .join(
                F.broadcast(
                    datasets.select("container_uri", "record_id").dropDuplicates(
                        ["container_uri"]
                    )
                ),
                "container_uri",
            )
            .join(
                F.broadcast(
                    records.select(
                        F.col("id").alias("record_id"),
                        F.col("datetime").alias("record_datetime"),
                    )
                ),
                "record_id",
            )
        )
        out = str(tmp_path / "consolidated")
        consolidate_tiles(job_tiles, "Z=0>T>R>B", out)
        back = spark.read.parquet(out)
        assert back.count() == job_tiles.count()

        # 3. SWAP: old actives of the job flip to TODELETE, new rows ACTIVE
        new_rows = (
            datasets.filter(F.col("id").isin(list(planned_ids)))
            .withColumn("id", F.concat(F.col("id"), F.lit("-cons")))
            .withColumn("locked_by_job_id", F.lit(None).cast("string"))
        )
        swapped = swap_datasets(datasets, "job-0", new_rows)
        assert swapped.filter(F.col("id").endswith("-cons")).count() == len(planned_ids)

        # 4. READ equivalence: mosaic over rewritten tiles == over originals
        nodata = -32768.0
        int16 = datasets.filter(F.col("dmapping.no_data") == nodata).select(
            "container_uri"
        )
        orig = job_tiles.join(F.broadcast(int16), "container_uri", "left_semi")
        rewritten = back.join(F.broadcast(int16), "container_uri", "left_semi")
        m_orig = {
            (r["band"], r["block_x"], r["block_y"]): r["px"]
            for r in mosaic_blocks(orig, nodata).collect()
        }
        m_new = {
            (r["band"], r["block_x"], r["block_y"]): r["px"]
            for r in mosaic_blocks(rewritten, nodata).collect()
        }
        assert m_orig == m_new


class TestIngestValidation:
    def test_fixture_catalog_is_clean_for_tiled_datasets(self, spark, fixture_dir):
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        tiles = spark.read.parquet(f"{fixture_dir}/tiles.parquet")
        tiled = datasets.join(
            tiles.select("container_uri").distinct(), "container_uri", "left_semi"
        )
        # fixture pixel values are % 9973 which EXCEEDS some mappings'
        # max_value (Float32 [0,1]); restrict to the Int16 [0,10000] ones
        clean = tiled.filter(
            (F.col("dmapping.max_value") >= 9973.0)
            & (F.col("bands") == F.array(F.lit(1).cast("smallint")))
        )
        problems = validate_datasets_against_tiles(clean, tiles).collect()
        assert problems == []

    def test_detects_missing_band_and_range(self, spark):
        datasets = spark.createDataFrame(
            [
                ("d1", "c1", [1, 2], {"dtype": "UInt8", "no_data": 0.0,
                 "min_value": 0.0, "max_value": 10.0, "real_min_value": 0.0,
                 "real_max_value": 1.0, "exponent": 1.0}),
            ],
            "id STRING, container_uri STRING, bands ARRAY<INT>,"
            " dmapping STRUCT<dtype:STRING,no_data:DOUBLE,min_value:DOUBLE,max_value:DOUBLE,"
            "real_min_value:DOUBLE,real_max_value:DOUBLE,exponent:DOUBLE>",
        )
        tiles = spark.createDataFrame(
            [("c1", 1, 0, 0, 0, [5.0, 99.0])],  # band 2 missing; 99 > max 10
            "container_uri STRING, band INT, level INT, block_x INT, block_y INT, px ARRAY<DOUBLE>",
        )
        problems = {
            (r["band"], r["problem"])
            for r in validate_datasets_against_tiles(datasets, tiles).collect()
        }
        assert (2, "missing_band") in problems
        assert (1, "value_out_of_range") in problems


class TestChunkStream:
    def test_chunk_compress_roundtrip(self):
        data = bytes(range(256)) * 5000  # 1.28 MB
        chunks = chunk_bytes(data, 512 * 1024)
        assert len(chunks) == 3
        assert max(len(c) for c in chunks) <= 512 * 1024
        comp = compress_chunks(chunks, level=6)
        assert decompress_chunks(comp) == data

    def test_negative_level_and_empty(self):
        assert decompress_chunks(compress_chunks([b""], level=-2)) == b""
        assert chunk_bytes(b"") == [b""]


class TestCooperativeCancellation:
    """handler_consolidation.go:373-395 parity: a cancel MARKER dropped
    mid-job stops the batch loop before the next batch and the atomic
    publish never happens — the live layout is untouched."""

    def _tiles(self, spark, n_cells=6):
        from pyspark.sql import functions as F

        rows = [
            (f"cell{c}", 1, 0, 0, 0, [float(c)], "r0", "2024-01-01")
            for c in range(n_cells)
        ]
        return spark.createDataFrame(
            rows,
            "cell_uri string, band int, level int, block_x int, block_y int,"
            " px array<double>, record_id string, record_datetime string",
        ).withColumn(
            "record_datetime", F.col("record_datetime").cast("timestamp")
        )

    def test_cancel_mid_job_never_publishes(self, spark, tmp_path):
        import os

        from geocube_spark.operators.consolidation import (
            consolidate_tiles_cancellable,
            request_cancellation,
        )

        out = str(tmp_path / "out")
        cancel_dir = str(tmp_path / "cancelled")
        seen = []

        def progress(done, total):
            seen.append((done, total))
            if done == 1:  # the user cancels after the first batch lands
                request_cancellation(cancel_dir, "job-x")

        status = consolidate_tiles_cancellable(
            self._tiles(spark),
            "Z>T>R>B",
            out,
            job_id="job-x",
            cancel_dir=cancel_dir,
            batch_cells=2,
            progress=progress,
        )
        assert status == "CANCELLED"
        assert not os.path.exists(out)  # atomic swap never happened
        assert not os.path.exists(out + ".staging")  # staging discarded
        assert seen[0] == (1, 3) and len(seen) <= 2

    def test_uncancelled_job_publishes_atomically(self, spark, tmp_path):
        import os

        from geocube_spark.operators.consolidation import (
            consolidate_tiles_cancellable,
        )

        out = str(tmp_path / "out")
        status = consolidate_tiles_cancellable(
            self._tiles(spark),
            "Z>T>R>B",
            out,
            job_id="job-y",
            cancel_dir=str(tmp_path / "cancelled"),
            batch_cells=2,
        )
        assert status == "DONE"
        assert not os.path.exists(out + ".staging")
        back = spark.read.parquet(out)
        assert back.select("cell_uri").distinct().count() == 6

    def test_cancelled_status_maps_onto_state_machine(self, spark, tmp_path):
        from geocube_spark.operators.consolidation import (
            consolidate_tiles_cancellable,
            request_cancellation,
        )
        from geocube_spark.streaming.jobs import trigger

        cancel_dir = str(tmp_path / "cancelled")
        request_cancellation(cancel_dir, "job-z")  # cancelled before start
        status = consolidate_tiles_cancellable(
            self._tiles(spark),
            "Z>T>R>B",
            str(tmp_path / "out"),
            job_id="job-z",
            cancel_dir=cancel_dir,
            batch_cells=2,
        )
        assert status == "CANCELLED"
        # the worker reports the cancel through the reference's arcs
        st, _, handled = trigger(
            "consolidation", "CONSOLIDATIONINPROGRESS", False, 0,
            "CancelledByUserForced",
        )
        assert handled and st == "CONSOLIDATIONCANCELLING"
        st, _, handled = trigger("consolidation", st, False, 0, "CancellationDone")
        assert handled and st == "ABORTED"


class TestReconsolidationNeed:
    """consolidater_test.go:71-139 (CsldPrepareOrdersNeedReconsolidation)
    ported context-for-context against operators.consolidation.
    reconsolidation_plan.  Container: gs://BaseName2, DataMapping F
    (Float32 [0,1] ext [0,1]), 3 bands."""

    DM_F = {"dtype": "Float32", "no_data": 0.0, "min_value": 0.0, "max_value": 1.0,
            "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 0.0}
    DM_I = {"dtype": "Int16", "no_data": 0.0, "min_value": 0.0, "max_value": 10000.0,
            "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 0.0}
    UNCONSOLIDATED = ("gs://BaseName1/1.tiff", [1, 2, 3], "F")
    CONTAINER = ("gs://BaseName2", 3)

    def _plan(self, spark, rows):
        from geocube_spark.operators.consolidation import reconsolidation_plan

        data = [
            {"container_uri": uri, "bands": bands,
             "dmapping": self.DM_F if dm == "F" else self.DM_I}
            for uri, bands, dm in rows
        ]
        df = spark.createDataFrame(
            data,
            "container_uri string, bands array<int>, dmapping struct<"
            "dtype:string,no_data:double,min_value:double,max_value:double,"
            "real_min_value:double,real_max_value:double,exponent:double>",
        )
        out = reconsolidation_plan(df, self.CONTAINER[0], self.DM_F, self.CONTAINER[1])
        got = out.collect()
        need = any(r["consolidation"] for r in got)
        reusable = sorted({r["container_uri"] for r in got if r["reusable"]})
        return need, reusable

    def test_one_basic_dataset(self, spark):
        need, reuse = self._plan(spark, [self.UNCONSOLIDATED])
        assert need and reuse == []

    def test_consolidated_with_other_dataformat(self, spark):
        need, reuse = self._plan(spark, [("gs://BaseName21.tiff", [1, 2, 3], "I")])
        assert need and reuse == []

    def test_consolidated_with_other_bands(self, spark):
        # band 4 exceeds the container's 3 bands -> NeedsReconsolidation
        need, reuse = self._plan(spark, [("gs://BaseName21.tiff", [2, 3, 4], "F")])
        assert need and reuse == []

    def test_consolidated_identical(self, spark):
        need, reuse = self._plan(spark, [("gs://BaseName21.tiff", [1, 2, 3], "F")])
        assert not need and reuse == ["gs://BaseName21.tiff"]

    def test_several_identical_same_container(self, spark):
        need, reuse = self._plan(
            spark,
            [("gs://BaseName21.tiff", [1, 2, 3], "F")] * 2,
        )
        assert not need and reuse == ["gs://BaseName21.tiff"]

    def test_several_identical_two_containers(self, spark):
        need, reuse = self._plan(
            spark,
            [("gs://BaseName21.tiff", [1, 2, 3], "F"),
             ("gs://BaseName22.tiff", [1, 2, 3], "F")],
        )
        assert not need
        assert reuse == ["gs://BaseName21.tiff", "gs://BaseName22.tiff"]

    def test_mixed_consolidated_and_not(self, spark):
        need, reuse = self._plan(
            spark,
            [("gs://BaseName21.tiff", [1, 2, 3], "F"),
             ("gs://BaseName22.tiff", [1, 2, 3], "F"),
             self.UNCONSOLIDATED],
        )
        assert need  # the unconsolidated dataset drags the job in
        assert reuse == ["gs://BaseName21.tiff", "gs://BaseName22.tiff"]

    def test_container_level_memoization(self, spark):
        """A container where ONE dataset triggers reconsolidation drags its
        sibling datasets along (the needReconsolidation[uri] memo in the
        reference loop)."""
        need, reuse = self._plan(
            spark,
            [("gs://BaseName21.tiff", [1, 2, 3], "F"),
             ("gs://BaseName21.tiff", [2, 3, 4], "F")],  # band 4 overflows
        )
        assert need and reuse == []
