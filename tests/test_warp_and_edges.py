"""Affine algebra (C7), palette (C10), regrid (R2), XYZ tile (R11),
interlacing sort spec (R7/O12), consolidation planning."""

from __future__ import annotations

import math
from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.affine import Affine
from geocube_spark.functions.palette import (
    ColorPoint,
    apply_palette_expr,
    build_lut,
    validate_palette,
)
from geocube_spark.operators.consolidation import (
    interlacing_sort_columns,
    plan_consolidation,
)
from geocube_spark.operators.cover import RegularGridSpec
from geocube_spark.operators.regrid import regrid_to_grid, xyz_tile, xyz_tile_grid


class TestAffine:
    def test_apply_and_inverse_roundtrip(self):
        gt = Affine(10.0, 0.0, 500.0, 0.0, -10.0, 800.0)
        x, y = gt.apply(3, 7)
        assert (x, y) == (530.0, 730.0)
        col, row = gt.inverse().apply(x, y)
        assert (col, row) == pytest.approx((3.0, 7.0))

    def test_multiply_compose(self):
        t = Affine.translation(5, -3)
        s = Affine.scale(2, 4)
        ts = t.multiply(s)
        assert ts.apply(1, 1) == (7.0, 1.0)  # scale then translate

    def test_non_invertible(self):
        degenerate = Affine(1.0, 2.0, 0.0, 2.0, 4.0, 0.0)
        assert not degenerate.invertible()
        with pytest.raises(ValueError):
            degenerate.inverse()


class TestPalette:
    POINTS = [
        ColorPoint(0.0, 0, 0, 0, 255),
        ColorPoint(0.5, 255, 0, 0, 255),
        ColorPoint(1.0, 255, 255, 255, 255),
    ]

    def test_lut_endpoints_and_midpoint(self):
        lut = build_lut(self.POINTS)
        assert lut[0] == (0, 0, 0, 255)
        assert lut[-1] == (255, 255, 255, 255)
        r, g, b, a = lut[128]
        assert r == 255 and g < 10  # just past the 0.5 pivot

    def test_linear_interp(self):
        lut = build_lut(self.POINTS)
        # value 0.25 -> halfway into first segment -> r ≈ 127.5
        assert abs(lut[64][0] - 128) <= 1

    @pytest.mark.parametrize(
        "pts",
        [
            [ColorPoint(0.0, 0, 0, 0, 255)],  # too few
            [ColorPoint(0.1, 0, 0, 0, 255), ColorPoint(1.0, 1, 1, 1, 255)],  # no 0
            [ColorPoint(0.0, 0, 0, 0, 255), ColorPoint(1.0, 300, 0, 0, 255)],  # bad channel
        ],
    )
    def test_validation(self, pts):
        with pytest.raises(ValueError):
            validate_palette(pts)

    def test_apply_expr(self, spark):
        lut = build_lut(self.POINTS)
        df = spark.createDataFrame([([0.0, 0.5, 1.0],)], "px ARRAY<DOUBLE>")
        out = df.select(apply_palette_expr(F.col("px"), lut).alias("rgba")).first()["rgba"]
        assert out[0] == ((0 << 24) | (0 << 16) | (0 << 8) | 255)
        assert out[2] == ((255 << 24) | (255 << 16) | (255 << 8) | 255)


class TestRegrid:
    def _tiles(self, spark, origin=(1000.0, 2000.0), res=10.0):
        """One 4×4 source block at CRS origin (1000,2000), 10 m pixels."""
        px = [float(v) for v in range(16)]
        return spark.createDataFrame(
            [
                (
                    "c0", 1, 0, 0, 0, px, 32631,
                    {"a": res, "b": 0.0, "c": origin[0], "d": 0.0, "e": -res, "f": origin[1]},
                    "r0", datetime(2018, 1, 1),
                )
            ],
            "container_uri STRING, band INT, level INT, block_x INT, block_y INT,"
            " px ARRAY<DOUBLE>, crs_srid INT,"
            " pix_to_crs STRUCT<a:DOUBLE,b:DOUBLE,c:DOUBLE,d:DOUBLE,e:DOUBLE,f:DOUBLE>,"
            " record_id STRING, record_datetime TIMESTAMP",
        )

    def test_identity_grid_roundtrip(self, spark):
        """Same origin/res -> regrid is the identity index map."""
        df = self._tiles(spark)
        out = regrid_to_grid(df, (1000.0, 2000.0), 10.0, out_block=4, nodata=-1.0)
        rows = {(r["out_block_x"], r["out_block_y"]): r["px"] for r in out.collect()}
        assert rows[(0, 0)] == [float(v) for v in range(16)]

    def test_shifted_grid(self, spark):
        """Output origin shifted by one pixel -> values shift, gaps nodata."""
        df = self._tiles(spark)
        out = regrid_to_grid(df, (1010.0, 2000.0), 10.0, out_block=4, nodata=-1.0)
        px = {(r["out_block_x"], r["out_block_y"]): np.array(r["px"]).reshape(4, 4) for r in out.collect()}
        got = px[(0, 0)]
        # column 0 of output = column 1 of source; last column = nodata
        assert got[0, 0] == 1.0 and got[0, 2] == 3.0 and got[0, 3] == -1.0

    def test_downsample_2x(self, spark):
        """Coarser output grid (20 m): NEAR picks the enclosing source px."""
        df = self._tiles(spark)
        out = regrid_to_grid(df, (1000.0, 2000.0), 20.0, out_block=2, nodata=-1.0)
        got = np.array(
            out.filter((F.col("out_block_x") == 0) & (F.col("out_block_y") == 0))
            .first()["px"]
        ).reshape(2, 2)
        # output centers at source px (1,1),(3,1),(1,3),(3,3) -> values 5,7,13,15
        assert got.tolist() == [[5.0, 7.0], [13.0, 15.0]]


class TestXYZ:
    def test_tile_grid_math(self):
        (ox, oy), res = xyz_tile_grid(0, 0, 0)
        circ = 2 * math.pi * 6378137.0
        assert res == pytest.approx(circ / 256)
        assert ox == pytest.approx(-circ / 2) and oy == pytest.approx(circ / 2)
        (_, _), res1 = xyz_tile_grid(1, 1, 1)
        assert res1 == pytest.approx(res / 2)

    def test_xyz_tile_end_to_end(self, spark):
        """A source block aligned to z=2 tile (1,1) mosaics into that tile."""
        (ox, oy), res = xyz_tile_grid(1, 1, 2)
        px = [7.0] * (256 * 256)
        df = spark.createDataFrame(
            [
                (
                    "c0", 1, 0, 0, 0, px, 3857,
                    {"a": res, "b": 0.0, "c": ox, "d": 0.0, "e": -res, "f": oy},
                    "r0", datetime(2018, 1, 1),
                )
            ],
            "container_uri STRING, band INT, level INT, block_x INT, block_y INT,"
            " px ARRAY<DOUBLE>, crs_srid INT,"
            " pix_to_crs STRUCT<a:DOUBLE,b:DOUBLE,c:DOUBLE,d:DOUBLE,e:DOUBLE,f:DOUBLE>,"
            " record_id STRING, record_datetime TIMESTAMP",
        )
        out = xyz_tile(df, 1, 1, 2, nodata=-1.0).collect()
        assert len(out) == 1
        vals = set(out[0]["px"])
        assert vals == {7.0}


class TestInterlacing:
    def test_pattern_to_sort_columns(self):
        # first clause drives the static column list; T = tiles (geotiff
        # blocks, layouts.proto:41-66), R = records (chronological)
        cols = interlacing_sort_columns("Z=0>T>R>B;Z=1:>R>T>B")
        assert cols == [
            "level", "block_y", "block_x",
            "record_datetime", "record_id", "band",
        ]

    def test_alternate_pattern(self):
        assert interlacing_sort_columns("R>Z>T>B") == [
            "record_datetime", "record_id", "level",
            "block_y", "block_x", "band",
        ]


class TestConsolidationPlanning:
    def test_plan_emits_chunked_tasks(self, spark, fixture_dir):
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        records = spark.read.parquet(f"{fixture_dir}/records.parquet")
        spec = RegularGridSpec(crs="epsg:4326", cell_size=400, resolution=0.01)  # 4° cells
        plan = plan_consolidation(datasets, records, "job-0", spec, max_records=3)
        rows = plan.collect()
        assert len(rows) > 0
        assert all(r["n_datasets"] <= 3 for r in rows)
        # members are time-ordered within each task (W2)
        for r in rows:
            ts = [m["t"] for m in r["datasets"]]
            assert ts == sorted(ts)
        # task URIs unique
        uris = [r["out_container_uri"] for r in rows]
        assert len(uris) == len(set(uris))


class TestPoolBlock:
    """regrid._pool_block: area-weighted pooling windows under warp (R2/R3
    GDAL -r average/mode/med during reprojection, image.go:396-408)."""

    def _corners(self, b, x0, y0, sx, sy):
        # axis-aligned corner grids: out pixel (r, c) covers source-pixel
        # rect [x0 + c*sx, x0 + (c+1)*sx) x [y0 + r*sy, ...)
        ex = x0 + np.arange(b + 1) * sx
        ey = y0 + np.arange(b + 1) * sy
        return np.meshgrid(ex, ey)

    def test_average_matches_naive(self):
        from geocube_spark.operators.regrid import _pool_block

        rng = np.random.default_rng(42)
        raster = rng.integers(0, 97, (40, 40)).astype(np.float64)
        csx, csy = self._corners(8, 1.3, 0.7, 4.6, 4.7)
        vals, own = _pool_block(raster, csx, csy, "AVERAGE", -1.0)
        assert own.all()
        for r in range(8):
            for c in range(8):
                xm, xM = csx[r, c], csx[r, c + 1]
                ym, yM = csy[r, c], csy[r + 1, c]
                ixs = [i for i in range(40) if xm <= i + 0.5 < xM]
                iys = [j for j in range(40) if ym <= j + 0.5 < yM]
                expect = np.mean([raster[j, i] for j in iys for i in ixs])
                assert vals[r, c] == pytest.approx(expect, abs=1e-12)

    def test_nodata_excluded_from_average(self):
        from geocube_spark.operators.regrid import _pool_block

        raster = np.full((10, 10), 5.0)
        raster[0:2, 0:2] = -1.0  # nodata corner
        csx, csy = self._corners(2, 0.0, 0.0, 5.0, 5.0)
        vals, own = _pool_block(raster, csx, csy, "AVERAGE", -1.0)
        assert vals[0, 0] == pytest.approx(5.0)  # mean of VALID only
        assert vals[1, 1] == pytest.approx(5.0)

    def test_all_nodata_window_stays_nodata(self):
        from geocube_spark.operators.regrid import _pool_block

        raster = np.full((10, 10), -1.0)
        csx, csy = self._corners(2, 0.0, 0.0, 5.0, 5.0)
        vals, own = _pool_block(raster, csx, csy, "AVERAGE", -1.0)
        assert own.all() and (vals == -1.0).all()

    def test_degenerate_window_falls_back_to_center_pixel(self):
        from geocube_spark.operators.regrid import _pool_block

        # upsampling: out pixel rect smaller than one source pixel and not
        # containing any center -> samples the pixel under the window center
        raster = np.arange(16, dtype=np.float64).reshape(4, 4)
        csx, csy = self._corners(2, 1.6, 2.6, 0.2, 0.2)
        vals, own = _pool_block(raster, csx, csy, "AVERAGE", -1.0)
        assert own.all()
        assert vals[0, 0] == raster[2, 1]

    def test_mode_tiebreak_smallest(self):
        from geocube_spark.operators.regrid import _pool_block

        raster = np.array([[7.0, 3.0], [3.0, 7.0]])
        csx, csy = self._corners(1, 0.0, 0.0, 2.0, 2.0)
        vals, _ = _pool_block(raster, csx, csy, "MODE", -1.0)
        assert vals[0, 0] == 3.0  # 2-2 tie -> smallest value

    def test_median_and_minmax(self):
        from geocube_spark.operators.regrid import _pool_block

        raster = np.array([[1.0, 2.0], [3.0, 100.0]])
        csx, csy = self._corners(1, 0.0, 0.0, 2.0, 2.0)
        med, _ = _pool_block(raster, csx, csy, "MED", -1.0)
        mn, _ = _pool_block(raster, csx, csy, "MIN", -1.0)
        mx, _ = _pool_block(raster, csx, csy, "MAX", -1.0)
        assert med[0, 0] == 2.5 and mn[0, 0] == 1.0 and mx[0, 0] == 100.0

    def test_ownership_outside_raster(self):
        from geocube_spark.operators.regrid import _pool_block

        raster = np.ones((4, 4))
        csx, csy = self._corners(2, -20.0, -20.0, 5.0, 5.0)
        vals, own = _pool_block(raster, csx, csy, "AVERAGE", -1.0)
        assert not own.any()

    def test_nan_nodata(self):
        from geocube_spark.operators.regrid import _pool_block

        raster = np.full((6, 6), 2.0)
        raster[0, 0] = np.nan
        csx, csy = self._corners(2, 0.0, 0.0, 3.0, 3.0)
        vals, own = _pool_block(raster, csx, csy, "AVERAGE", float("nan"))
        assert vals[0, 0] == pytest.approx(2.0)


class TestAffineHighPrecision:
    """Ported reference test (affine_test.go TestHighPrecision): at
    webmercator zoom 10, composing the geotransform with a large pixel
    Translation must agree with direct application of the un-composed
    transform to 1e-9 m — the precision property the reference's affine
    composition guarantees for deep-zoom tile addressing."""

    def test_composed_translation_matches_direct(self):
        import math

        earth_radius = 6378137.0
        ox, oy = -earth_radius * math.pi, earth_radius * math.pi
        resolution = 2 * earth_radius * math.pi / (256 * (1 << 10))
        a = Affine.translation(ox, oy).multiply(
            Affine.scale(resolution, -resolution)
        )
        i0, j0 = 600 * 256, 300 * 256
        a0 = a.multiply(Affine.translation(i0, j0))
        d = 1024.0
        while d < 16384:
            x0, y0 = a0.apply(d, d)
            x1, y1 = a.apply(i0 + d, j0 + d)
            assert abs(x0 - x1) <= 1e-9, (d, x0, x1)
            assert abs(y0 - y1) <= 1e-9, (d, y0, y1)
            d += 256
