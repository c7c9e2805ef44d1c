"""Resampling-kernel properties (R3, variable.go:18-61) — closed-form
invariants, frozen so kernel edits can't silently change warp output."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.resample import (
    INTERP_KERNELS,
    kernel_weights_1d,
    sample_grid,
)

RNG = np.random.RandomState(11)


def grid_of(fn, h=32, w=32):
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    # value at pixel center (i+0.5, j+0.5)
    return fn(ii + 0.5, jj + 0.5)


class TestWeights:
    @pytest.mark.parametrize("method", ["BILINEAR", "CUBIC", "CUBICSPLINE", "LANCZOS"])
    def test_partition_of_unity(self, method):
        t = RNG.uniform(0, 1, 64)
        _, w = kernel_weights_1d(t, method)
        assert np.allclose(w.sum(axis=-1), 1.0, atol=1e-12)

    def test_keys_half_pixel_closed_form(self):
        # the canonical Keys a=-0.5 weights at t=0.5: (-1/16, 9/16, 9/16, -1/16)
        _, w = kernel_weights_1d(np.array([0.5]), "CUBIC")
        assert np.allclose(w[0], [-1 / 16, 9 / 16, 9 / 16, -1 / 16], atol=1e-15)

    def test_bspline_at_integer_smooths(self):
        # B-spline at t=0: (1/6, 4/6, 1/6, 0) — NOT a delta: CUBICSPLINE
        # smooths rather than interpolates, by design
        _, w = kernel_weights_1d(np.array([0.0]), "CUBICSPLINE")
        assert np.allclose(w[0], [1 / 6, 4 / 6, 1 / 6, 0.0], atol=1e-15)

    @pytest.mark.parametrize("method", ["BILINEAR", "CUBIC", "LANCZOS"])
    def test_interpolating_kernels_are_deltas_at_integers(self, method):
        _, w = kernel_weights_1d(np.array([0.0]), method)
        k0 = list(w[0]).index(max(w[0], key=abs))
        want = np.zeros_like(w[0])
        want[k0] = 1.0
        assert np.allclose(w[0], want, atol=1e-12)


class TestSampleGrid:
    def centers(self, h, w, margin=4):
        # sample positions at random interior points (edge convention: the
        # center of pixel k is k+0.5)
        sx = RNG.uniform(margin, w - margin, (16, 16))
        sy = RNG.uniform(margin, h - margin, (16, 16))
        return sx, sy

    @pytest.mark.parametrize("method", list(INTERP_KERNELS))
    def test_constant_field_reproduced(self, method):
        src = np.full((32, 32), 7.25)
        sx, sy = self.centers(32, 32)
        out = sample_grid(src, sx, sy, method=method, nodata=-1.0)
        assert np.allclose(out, 7.25, atol=1e-9)

    @pytest.mark.parametrize("method", ["BILINEAR", "CUBIC", "CUBICSPLINE"])
    def test_linear_field_reproduced(self, method):
        src = grid_of(lambda i, j: 2.0 * j + 3.0 * i)  # linear in both axes
        sx, sy = self.centers(32, 32)
        out = sample_grid(src, sx, sy, method=method, nodata=-1.0)
        want = 2.0 * sx + 3.0 * sy  # field extended to continuous coords
        assert np.allclose(out, want, atol=1e-9)

    @pytest.mark.parametrize("method", ["BILINEAR", "CUBIC", "LANCZOS"])
    def test_interpolates_grid_values(self, method):
        src = RNG.uniform(0, 100, (32, 32))
        ii, jj = np.meshgrid(np.arange(8, 24), np.arange(8, 24))
        out = sample_grid(src, jj + 0.5, ii + 0.5, method=method, nodata=-1.0)
        assert np.allclose(out, src[ii, jj], atol=1e-9)

    def test_cubicspline_smooths_grid_values(self):
        src = RNG.uniform(0, 100, (32, 32))
        ii, jj = np.meshgrid(np.arange(8, 24), np.arange(8, 24))
        out = sample_grid(src, jj + 0.5, ii + 0.5, method="CUBICSPLINE", nodata=-1.0)
        assert not np.allclose(out, src[ii, jj], atol=1e-6)

    @pytest.mark.parametrize("method", list(INTERP_KERNELS))
    def test_out_of_bounds_is_nodata(self, method):
        src = np.ones((8, 8))
        out = sample_grid(
            src,
            np.array([[-0.5, 8.5, 4.0]]),
            np.array([[4.0, 4.0, 9.0]]),
            method=method,
            nodata=-7.0,
        )
        assert out.tolist() == [[-7.0, -7.0, -7.0]]

    def test_near_matches_floor(self):
        src = np.arange(64, dtype=float).reshape(8, 8)
        sx = np.array([[0.1, 3.9, 7.99]])
        sy = np.array([[0.1, 2.5, 7.99]])
        out = sample_grid(src, sx, sy, method="NEAR", nodata=-1.0)
        assert out.tolist() == [[0.0, 2 * 8 + 3.0, 7 * 8 + 7.0]]


class TestNodataMasking:
    def test_bilinear_masks_source_nodata(self):
        # a nodata neighbor must be excluded + weights renormalized, not
        # smeared into the sample (GDAL nodata-mask semantics)
        src = np.full((8, 8), 5.0)
        src[3, 4] = -999.0
        out = sample_grid(
            src,
            np.array([[4.0]]),  # between pixels 3 and 4 in x
            np.array([[3.9]]),
            method="BILINEAR",
            nodata=-1.0,
            src_nodata=-999.0,
        )
        assert out[0, 0] == pytest.approx(5.0)  # renormalized over valid taps

    def test_all_nodata_neighborhood_is_nodata(self):
        src = np.full((8, 8), -999.0)
        out = sample_grid(
            src, np.array([[4.0]]), np.array([[4.0]]),
            method="CUBIC", nodata=-1.0, src_nodata=-999.0,
        )
        assert out[0, 0] == -1.0


class TestCrossBlockSeam:
    def test_kernel_continuous_across_block_seam(self, spark):
        """The warp assembles the whole container raster, so a wide kernel
        sampled ON the seam between two source blocks sees both sides —
        linear reproduction must hold across the seam (a per-block
        edge-extend would flatten the gradient there)."""
        from datetime import datetime

        from geocube_spark.operators.regrid import regrid_to_grid

        n = 8
        rows = []
        for bx in range(2):  # two adjacent blocks in x, linear field v = gx
            jj, ii = np.meshgrid(np.arange(n), np.arange(n))
            v = (bx * n + jj).astype(float)
            rows.append(
                (
                    "c0", 1, 0, bx, 0, [float(x) for x in v.ravel()], 32631,
                    {"a": 10.0, "b": 0.0, "c": 0.0, "d": 0.0, "e": -10.0, "f": 0.0},
                    "r0", datetime(2018, 1, 1),
                )
            )
        df = spark.createDataFrame(
            rows,
            "container_uri STRING, band INT, level INT, block_x INT, block_y INT,"
            " px ARRAY<DOUBLE>, crs_srid INT,"
            " pix_to_crs STRUCT<a:DOUBLE,b:DOUBLE,c:DOUBLE,d:DOUBLE,e:DOUBLE,f:DOUBLE>,"
            " record_id STRING, record_datetime TIMESTAMP",
        )
        # output: 5 m grid straddling the seam at x = 80 m (source px 8)
        out = regrid_to_grid(
            df, (60.0, -20.0), 5.0, out_block=8, nodata=-1.0, resampling="CUBIC"
        )
        px = np.array(
            out.filter((F.col("out_block_x") == 0) & (F.col("out_block_y") == 0))
            .first()["px"]
        ).reshape(8, 8)
        # sample x positions (source px coords): 6.25, 6.75, ..., 9.75 —
        # crossing the seam; CUBIC reproduces the linear ramp exactly
        want = (60.0 + (np.arange(8) + 0.5) * 5.0) / 10.0 - 0.5
        assert np.allclose(px[4], want, atol=1e-9), (px[4], want)


class TestCrossCRSWarp:
    def test_webmercator_roundtrip_positions(self, spark):
        """BILINEAR cross-CRS warp of a linear field reproduces the field at
        the warped sample positions (linearity survives any index map)."""
        from datetime import datetime

        from geocube_spark.functions.crs import transform_points
        from geocube_spark.operators.regrid import regrid_to_grid

        n = 64
        jj, ii = np.meshgrid(np.arange(n), np.arange(n))
        lon = 0.015625 * (jj + 0.5)
        lat = 50.0 - 0.015625 * (ii + 0.5)
        src = (10.0 * lon + 4.0 * lat).ravel()
        df = spark.createDataFrame(
            [
                (
                    "c0", 1, 0, 0, 0, [float(v) for v in src], 4326,
                    {"a": 0.015625, "b": 0.0, "c": 0.0, "d": 0.0, "e": -0.015625, "f": 50.0},
                    "r0", datetime(2018, 1, 1),
                )
            ],
            "container_uri STRING, band INT, level INT, block_x INT, block_y INT,"
            " px ARRAY<DOUBLE>, crs_srid INT,"
            " pix_to_crs STRUCT<a:DOUBLE,b:DOUBLE,c:DOUBLE,d:DOUBLE,e:DOUBLE,f:DOUBLE>,"
            " record_id STRING, record_datetime TIMESTAMP",
        )
        out = regrid_to_grid(
            df,
            out_origin=(20000.0, 6420000.0),  # interior of the source footprint
            out_res=800.0,
            out_block=16,
            nodata=-999.0,
            resampling="BILINEAR",
            src_srid=4326,
            dst_srid=3857,
        ).filter((F.col("out_block_x") == 0) & (F.col("out_block_y") == 0))
        px = np.array(out.first()["px"]).reshape(16, 16)
        # expected: field value at each output pixel center's lon/lat
        mx = 20000.0 + (np.arange(16) + 0.5) * 800.0
        my = 6420000.0 - (np.arange(16) + 0.5) * 800.0
        glon, glat = transform_points(3857, 4326, *np.meshgrid(mx, my))
        want = 10.0 * glon + 4.0 * glat
        assert px.min() > -999.0  # fully covered, no nodata
        assert np.allclose(px, want, atol=1e-6)
