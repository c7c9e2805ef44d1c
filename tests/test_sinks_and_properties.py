"""Physical-layout sinks (S5/S6/O12), full GetCube path, swap transaction,
and hypothesis property tests for the cast kernel."""

from __future__ import annotations

import math
from datetime import datetime

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geocube_spark.functions.dataformat import cast_numpy
from geocube_spark.operators.consolidation import (
    consolidate_tiles,
    interlacing_sort_columns,
    swap_datasets,
)
from geocube_spark.plans.cube import get_cube
from geocube_spark.plans.find_datasets import DatasetFilters


class TestConsolidatedSink:
    def test_partitioned_sorted_write(self, spark, fixture_dir, tmp_path):
        """S5/S6: tile rewrite partitioned by cell with the interlacing sort
        order physically materialized (the MuCOG analogue)."""
        tiles = spark.read.parquet(f"{fixture_dir}/tiles.parquet")
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        records = spark.read.parquet(f"{fixture_dir}/records.parquet")
        joined = (
            tiles.join(datasets.select("container_uri", "record_id"), "container_uri")
            .join(
                records.select(
                    F.col("id").alias("record_id"), F.col("datetime").alias("record_datetime")
                ),
                "record_id",
            )
            .withColumn("cell_uri", F.concat_ws("_", "block_x", "block_y"))
        )
        out = str(tmp_path / "consolidated")
        consolidate_tiles(joined, "Z=0>T>R>B", out)

        back = spark.read.parquet(out)
        assert back.count() == joined.count()
        # partition column materialized as directory
        assert back.select("cell_uri").distinct().count() == 4
        # within each file, rows are ordered by (level, record_datetime, ...)
        import glob as g

        one_part = sorted(g.glob(f"{out}/cell_uri=*/*.parquet"))[0]
        pdf = spark.read.parquet(one_part).toPandas()
        keys = list(zip(pdf["level"], pdf["record_datetime"], pdf["record_id"]))
        assert keys == sorted(keys)

    def test_swap_is_transactional_flip(self, spark, fixture_dir):
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        new = datasets.filter(F.col("locked_by_job_id") == "job-0").withColumn(
            "id", F.concat(F.col("id"), F.lit("-new"))
        )
        swapped = swap_datasets(datasets, "job-0", new)
        old_active = datasets.filter(
            (F.col("locked_by_job_id") == "job-0") & (F.col("status") == "ACTIVE")
        ).count()
        flipped = swapped.filter(
            (F.col("locked_by_job_id") == "job-0")
            & (F.col("status") == "TODELETE")
            & ~F.col("id").endswith("-new")
        ).count()
        assert flipped == old_active
        assert swapped.filter(F.col("id").endswith("-new")).count() == new.count()
        # idempotent re-entry: applying the flip to already-flipped rows is a no-op
        reflipped = swap_datasets(swapped.filter(~F.col("id").endswith("-new")), "job-0", new)
        assert (
            reflipped.filter(F.col("status") == "TODELETE").count()
            == swapped.filter(~F.col("id").endswith("-new"))
            .filter(F.col("status") == "TODELETE")
            .count()
        )


class TestGetCubeFull:
    def test_pixels_end_to_end(self, spark, fixture_dir):
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet").filter(
            F.col("dmapping.no_data") == -32768.0
        )
        records = spark.read.parquet(f"{fixture_dir}/records.parquet")
        tiles = spark.read.parquet(f"{fixture_dir}/tiles.parquet").filter(F.col("level") == 0)
        flt = DatasetFilters(
            status="ACTIVE", time_from=datetime(2018, 1, 1), time_to=datetime(2018, 3, 1),
            order=False,
        )
        cube = get_cube(datasets, records, tiles, flt, nodata=-32768.0)
        rows = cube.collect()
        assert len(rows) == 4  # 2×2 blocks, one band
        assert all(len(r["px"]) == 4096 for r in rows)
        assert all(r["n_inputs"] >= 1 for r in rows)

    def test_valid_fraction_gate(self, spark, fixture_dir):
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet").filter(
            F.col("dmapping.no_data") == -32768.0
        )
        records = spark.read.parquet(f"{fixture_dir}/records.parquet")
        tiles = spark.read.parquet(f"{fixture_dir}/tiles.parquet").filter(F.col("level") == 0)
        flt = DatasetFilters(status="ACTIVE", order=False)
        cube = get_cube(
            datasets, records, tiles, flt, nodata=-32768.0, min_valid_fraction=1.01
        )
        assert cube.count() == 0


# ---------------------------------------------------------- property tests

mappings = st.fixed_dictionaries(
    {
        "dtype": st.sampled_from(["UInt8", "Int16", "Int32", "Float32"]),
        "no_data": st.just(-9999.0),
        "min_value": st.just(0.0),
        "max_value": st.sampled_from([100.0, 255.0, 10000.0]),
        "real_min_value": st.just(0.0),
        "real_max_value": st.just(1.0),
        "exponent": st.sampled_from([1.0, 2.0, 0.5]),
    }
)


class TestCastProperties:
    @given(src=mappings, vals=st.lists(st.floats(0.0, 100.0), min_size=1, max_size=20))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip_identity(self, src, vals):
        """cast src->dst->src recovers the value (within float tolerance)
        when dst has enough resolution (Float32 external chain)."""
        dst = dict(src, dtype="Float32", min_value=0.0, max_value=1.0, exponent=1.0)
        arr = np.array(vals)
        fwd = cast_numpy(arr, src, dst)
        back = cast_numpy(fwd, dst, src)
        mask = arr != src["no_data"]
        # an integer source dtype quantizes on the way back: ±0.5 absolute
        from geocube_spark.schemas import INT_DTYPES

        atol = 0.5001 if src["dtype"] in INT_DTYPES else 1e-6
        np.testing.assert_allclose(back[mask], arr[mask], atol=atol)

    @given(src=mappings)
    @settings(max_examples=50, deadline=None)
    def test_nodata_always_maps_to_nodata(self, src):
        dst = dict(src, no_data=-1.0)
        out = cast_numpy(np.array([src["no_data"]]), src, dst)
        assert out[0] == -1.0

    @given(
        src=mappings,
        vals=st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=10),
    )
    @settings(max_examples=50, deadline=None)
    def test_output_always_within_dtype_bounds(self, src, vals):
        from geocube_spark.schemas import DTYPE_BOUNDS

        dst = dict(src, dtype="UInt8", no_data=0.0)
        arr = np.array(vals)
        out = cast_numpy(arr, src, dst)
        lo, hi = DTYPE_BOUNDS["UInt8"]
        finite = out[np.isfinite(out)]
        assert ((finite >= lo) & (finite <= hi)).all() or math.isnan(src["exponent"])


class TestCodecProperties:
    """Hypothesis round-trips for the byte codecs under arbitrary inputs
    (the structured fixtures elsewhere only exercise raster-shaped data)."""

    @given(raw=st.binary(max_size=4096))
    @settings(max_examples=60, deadline=None)
    def test_packbits_roundtrip(self, raw):
        from geocube_spark.sources.gtiff import packbits_decode, packbits_encode

        assert packbits_decode(packbits_encode(raw)) == raw

    @given(raw=st.binary(max_size=4096))
    @settings(max_examples=40, deadline=None)
    def test_lzw_roundtrip(self, raw):
        from geocube_spark.sources.gtiff import lzw_decode, lzw_encode

        assert lzw_decode(lzw_encode(raw)) == raw

    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        rps=st.integers(1, 41),
        seed=st.integers(0, 2**16),
    )
    @settings(max_examples=30, deadline=None)
    def test_strip_layout_any_geometry(self, w, h, rps, seed):
        import numpy as np

        from geocube_spark.sources.gtiff import (
            RasterImage,
            read_tiff,
            write_tiff,
        )

        rng = np.random.default_rng(seed)
        img = RasterImage(
            bands=rng.integers(0, 255, (1, h, w)).astype("uint8"),
            transform=(1.0, 0.0, 0.0, 0.0, -1.0, 0.0),
        )
        data = write_tiff(
            [img], compression="packbits", layout="strip", rows_per_strip=rps
        )
        np.testing.assert_array_equal(read_tiff(data)[0].bands, img.bands)
