"""Pure-function units: glob→LIKE (pg_test.go:15-26 parity), geometry kernel,
affine-free utilities, job state machine."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geocube_spark.functions.dataformat import CastError, cast_numpy, check_castable
from geocube_spark.functions.geometry import (
    clip_convex,
    decode_wkb,
    densify_ring,
    geom_hash,
    multipolygon_wkb,
    polygon_interior_intersects_rect,
    polygon_wkb,
    rect_wkb,
    split_antimeridian_rect,
    wkb_bounds,
)
from geocube_spark.functions.globs import glob_to_like, like_sql
from geocube_spark.streaming.jobs import advance_job_state


class TestGlobToLike:
    """Mirror of the reference's parseLike unit table (pg.go:241-277)."""

    @pytest.mark.parametrize(
        "glob,pattern,op",
        [
            ("exact", "exact", "eq"),
            ("sta*", "sta%", "like"),
            ("sta?", "sta_", "like"),
            ("*mid*", "%mid%", "like"),
            ("with_underscore", "with_underscore", "eq"),
            ("wild*_end", "wild%\\_end", "like"),
            ("CASE*(?i)", "CASE%", "ilike"),
            ("exact(?i)", "exact", "ieq"),
            ("100%", "100%", "eq"),  # literal % escaped, no wildcard -> eq on original
        ],
    )
    def test_translation(self, glob, pattern, op):
        spec = glob_to_like(glob)
        assert (spec.pattern, spec.op) == (pattern, op)

    def test_sql_fragment(self):
        assert like_sql("name", "S2A_*") == "name LIKE 'S2A\\_%'"
        assert like_sql("name", "abc") == "name = 'abc'"


class TestWKB:
    def test_roundtrip_polygon(self):
        ring = [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (0.0, 1.0)]
        rings = decode_wkb(polygon_wkb(ring))
        assert rings[0][:-1] == ring  # closed on encode

    def test_roundtrip_multipolygon(self):
        wkb = multipolygon_wkb([[(0, 0), (1, 0), (1, 1)], [(5, 5), (6, 5), (6, 6)]])
        rings = decode_wkb(wkb)
        assert len(rings) == 2

    def test_hash_dedup_collision(self):
        # identical geometry -> identical hash (record.go:33-58)
        a = rect_wkb(0, 0, 1, 1)
        b = rect_wkb(0, 0, 1, 1)
        assert geom_hash(a) == geom_hash(b)
        assert geom_hash(a) != geom_hash(rect_wkb(0, 0, 1, 2))

    def test_bounds(self):
        assert wkb_bounds(rect_wkb(-1, -2, 3, 4)) == (-1, -2, 3, 4)


class TestClip:
    def test_full_overlap(self):
        ring = [(0, 0), (4, 0), (4, 4), (0, 4)]
        out = clip_convex(ring, (1, 1, 3, 3))
        assert sorted(out) == [(1, 1), (1, 3), (3, 1), (3, 3)]

    def test_disjoint(self):
        assert clip_convex([(0, 0), (1, 0), (1, 1), (0, 1)], (5, 5, 6, 6)) == []

    def test_interior_intersects_touching_edge_is_false(self):
        # ST_Relate 'T********' = interiors must overlap (hard part #7)
        wkb = rect_wkb(0, 0, 1, 1)
        assert not polygon_interior_intersects_rect(wkb, (1.0, 0.0, 2.0, 1.0))
        assert polygon_interior_intersects_rect(wkb, (0.5, 0.5, 2.0, 2.0))


class TestGeneralGeometry:
    """Concave rings, interior rings (holes), even-odd PIP — the round-2
    general kernel (reference handles arbitrary multipolygons,
    pg_containers.go:302-310)."""

    U = [(0, 0), (4, 0), (4, 4), (3, 4), (3, 1), (1, 1), (1, 4), (0, 4)]

    def test_concave_clip_area(self):
        import numpy as np

        from geocube_spark.functions.geometry import _ring_area, clip_ring_rect

        # clip the U by a band across the notch: only the two arms remain
        out = clip_ring_rect(np.asarray(self.U, dtype=float), (0.5, 2.0, 3.5, 3.0))
        assert abs(abs(_ring_area(out)) - 1.0) < 1e-12  # 2 arms × (0.5×1.0)

    def test_concave_interior_intersects(self):
        from geocube_spark.functions.geometry import polygon_interior_intersects_rect, polygon_wkb

        wkb = polygon_wkb(self.U)
        # rect entirely inside the notch: bboxes overlap, interiors don't
        assert not polygon_interior_intersects_rect(wkb, (1.5, 2.0, 2.5, 3.0))
        # rect spanning into an arm
        assert polygon_interior_intersects_rect(wkb, (0.5, 2.0, 2.5, 3.0))

    def test_hole_roundtrip_and_intersects(self):
        from geocube_spark.functions.geometry import (
            decode_wkb_polygons,
            polygon_interior_intersects_rect,
            polygon_wkb,
            rect_clip_area_wkb,
        )

        wkb = polygon_wkb(
            [(0, 0), (6, 0), (6, 6), (0, 6)], holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]]
        )
        polys = decode_wkb_polygons(wkb)
        assert len(polys) == 1 and len(polys[0]) == 2  # interior ring KEPT
        # rect fully inside the hole: no interior intersection
        assert not polygon_interior_intersects_rect(wkb, (2.5, 2.5, 3.5, 3.5))
        # rect overlapping hole rim: area = rect area minus hole overlap
        assert abs(rect_clip_area_wkb(wkb, (1, 1, 3, 3)) - 3.0) < 1e-12
        # net polygon area
        assert abs(rect_clip_area_wkb(wkb, (-1, -1, 7, 7)) - 32.0) < 1e-12

    def test_even_odd_pip(self):
        import numpy as np

        from geocube_spark.functions.geometry import points_in_wkb_evenodd, polygon_wkb

        wkb = polygon_wkb(
            [(0, 0), (6, 0), (6, 6), (0, 6)], holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]]
        )
        pts = np.array([[1, 1], [3, 3], [5, 5], [7, 7], [2.5, 1.0]])
        got = list(points_in_wkb_evenodd(pts, wkb))
        assert got == [True, False, True, False, True]

    def test_pip_concave(self):
        import numpy as np

        from geocube_spark.functions.geometry import points_in_rings_evenodd

        ring = np.asarray(self.U, dtype=float)
        got = list(points_in_rings_evenodd(np.array([[2.0, 0.5], [2.0, 2.0], [0.5, 3.0]]), [ring]))
        assert got == [True, False, True]  # notch interior is OUTSIDE


class TestAntimeridian:
    def test_no_split(self):
        assert split_antimeridian_rect(10, 0, 20, 5) == [(10, 0, 20, 5)]

    def test_split(self):
        parts = split_antimeridian_rect(179, 0, -179, 5)
        assert parts == [(179, 0, 180.0, 5), (-180.0, 0, -179, 5)]

    def test_densify(self):
        ring = densify_ring([(0, 0), (10, 0), (10, 10), (0, 10)], max_step=1.0)
        xs = np.diff([p[0] for p in ring])
        ys = np.diff([p[1] for p in ring])
        assert max(np.maximum(abs(xs), abs(ys))) <= 1.0 + 1e-12


class TestCastNumpy:
    INT16 = {
        "dtype": "Int16", "no_data": -32768.0, "min_value": 0.0, "max_value": 10000.0,
        "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0,
    }
    UINT8 = {
        "dtype": "UInt8", "no_data": 0.0, "min_value": 1.0, "max_value": 255.0,
        "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0,
    }
    FLOAT = {
        "dtype": "Float32", "no_data": float("nan"), "min_value": 0.0, "max_value": 1.0,
        "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0,
    }

    def test_linear_cast(self):
        arr = np.array([0.0, 5000.0, 10000.0])
        out = cast_numpy(arr, self.INT16, self.UINT8)
        # 0 -> ext 0 -> 1; 5000 -> ext .5 -> 128; 10000 -> 255
        assert out.tolist() == [1.0, 128.0, 255.0]

    def test_nodata_remap(self):
        arr = np.array([-32768.0, 10000.0])
        out = cast_numpy(arr, self.INT16, self.UINT8)
        assert out.tolist() == [0.0, 255.0]

    def test_nan_nodata(self):
        arr = np.array([np.nan, 1.0])
        out = cast_numpy(arr, self.FLOAT, self.UINT8)
        assert out.tolist() == [0.0, 255.0]

    def test_clamp(self):
        # values below internal min extrapolate below dtype bound -> clamped
        src = dict(self.INT16, min_value=0.0, max_value=100.0)
        arr = np.array([-1000.0])
        out = cast_numpy(arr, src, self.UINT8)
        assert out.tolist() == [0.0]  # clamped to the UInt8 dtype bound (datatype.go:29-41)

    def test_exponent_roundtrip(self):
        src = dict(self.INT16, exponent=2.0)
        arr = np.array([2500.0])
        # ext = (2500/10000)^2 = 0.0625 ; identity external range back to itself
        out = cast_numpy(arr, src, self.FLOAT)
        assert out[0] == pytest.approx(0.0625)

    def test_identity_shortcircuit(self):
        arr = np.array([1.0, 2.0])
        out = cast_numpy(arr, self.INT16, dict(self.INT16))
        assert out.tolist() == arr.tolist()

    def test_uncastable_exponent_combinations_raise(self):
        # image.go:203-218 ErrUnableToCast: both exponents non-unit is only
        # castable when they are EQUAL with EQUAL external minima; different
        # external ranges alone are fine (cast0->cast3 golden family)
        check_castable(self.INT16, dict(self.UINT8, real_max_value=2.0))
        with pytest.raises(CastError):
            check_castable(
                dict(self.INT16, exponent=2.0), dict(self.UINT8, exponent=3.0)
            )
        with pytest.raises(CastError):
            check_castable(
                dict(self.INT16, exponent=2.0, real_min_value=-1.0),
                dict(self.UINT8, exponent=2.0, real_min_value=0.0),
            )
        # equal exponents + equal external min: castable even with
        # different external maxima (the cast5->cast7 golden case)
        check_castable(
            dict(self.INT16, exponent=2.0, real_max_value=0.5),
            dict(self.UINT8, exponent=2.0, real_max_value=1.0),
        )


class TestJobStateMachine:
    def test_happy_path(self):
        s = "NEW"
        for _ in range(5):
            s = advance_job_state(s, "ok")
        assert s == "CONSOLIDATIONEFFECTIVE"

    def test_retry_arc(self):
        s = advance_job_state("CONSOLIDATIONINPROGRESS", "error")
        assert s == "CONSOLIDATIONRETRYING"
        assert advance_job_state(s, "ok") == "CONSOLIDATIONINPROGRESS"

    def test_illegal(self):
        with pytest.raises(ValueError):
            advance_job_state("DONE", "ok")


def test_clamp_below_dtype():
    src = {
        "dtype": "Int16", "no_data": -32768.0, "min_value": 0.0, "max_value": 10000.0,
        "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0,
    }
    dst = {
        "dtype": "UInt8", "no_data": 255.0, "min_value": 0.0, "max_value": 255.0,
        "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0,
    }
    out = cast_numpy(np.array([-5000.0]), src, dst)
    assert out.tolist() == [0.0]
    assert math.isfinite(out[0])


class TestSpatialKeys:
    def test_geohash_known_vectors(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.functions.spatialkeys import geohash_expr

        df = spark.createDataFrame(
            [(10.40744, 57.64911), (-0.1278, 51.5074), (0.0, 0.0)],
            "lon double, lat double",
        )
        got = [
            r["gh"]
            for r in df.select(
                geohash_expr(F.col("lon"), F.col("lat"), 6).alias("gh")
            ).collect()
        ]
        # canonical public vectors: Jutland lighthouse, London, null island
        assert got == ["u4pruy", "gcpvj0", "s00000"]

    def test_zorder_interleave(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.functions.spatialkeys import zorder_expr

        row = spark.range(1).select(
            zorder_expr(F.lit(3), F.lit(5), 4).alias("a"),
            zorder_expr(F.lit(0), F.lit(0), 8).alias("b"),
            zorder_expr(F.lit(255), F.lit(255), 8).alias("c"),
        ).first()
        assert row["a"] == 0b100111  # x=011, y=101 interleaved
        assert row["b"] == 0
        assert row["c"] == 0xFFFF

    def test_zorder_aligned_quadrants_are_contiguous(self, spark):
        """The layout property that matters for range reads: every
        2^k-aligned quadrant occupies EXACTLY one contiguous key range of
        length 4^k — a 2D box scan touches whole byte ranges, not
        scattered rows (row-major numbering scatters it across n rows)."""
        from pyspark.sql import functions as F

        from geocube_spark.functions.spatialkeys import zorder_expr

        n = 16
        grid = spark.createDataFrame(
            [(x, y) for x in range(n) for y in range(n)], "x int, y int"
        ).select("x", "y", zorder_expr(F.col("x"), F.col("y"), 4).alias("z"))
        for (x0, y0, k) in ((4, 8, 4), (0, 0, 8), (12, 4, 4), (8, 8, 8)):
            q = grid.filter(
                F.col("x").between(x0, x0 + k - 1)
                & F.col("y").between(y0, y0 + k - 1)
            )
            row = q.agg(
                F.min("z").alias("lo"),
                F.max("z").alias("hi"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            assert row["n"] == k * k
            assert row["hi"] - row["lo"] + 1 == k * k, (x0, y0, k)


class TestQuadkeys:
    """Bing quadkey scheme: known vectors from the Bing Maps tile-system
    docs + the prefix-ancestor property."""

    def test_known_vectors(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.functions.spatialkeys import quadkey_from_xyz_expr

        df = spark.createDataFrame(
            [(3, 5, 3), (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)],
            "tx int, ty int, z int",
        )
        # Bing docs: tile (3,5) at level 3 -> "213"
        got3 = df.filter("z = 3").select(
            quadkey_from_xyz_expr(F.col("tx"), F.col("ty"), 3).alias("qk")
        ).collect()[0]["qk"]
        assert got3 == "213"
        l1 = {
            (r["tx"], r["ty"]): r["qk"]
            for r in df.filter("z = 1").select(
                "tx", "ty",
                quadkey_from_xyz_expr(F.col("tx"), F.col("ty"), 1).alias("qk"),
            ).collect()
        }
        assert l1 == {(0, 0): "0", (1, 0): "1", (0, 1): "2", (1, 1): "3"}

    def test_prefix_is_parent_tile(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.functions.spatialkeys import quadkey_from_xyz_expr

        df = spark.createDataFrame([(181, 101)], "tx int, ty int")
        qk8, qk7 = df.select(
            quadkey_from_xyz_expr(F.col("tx"), F.col("ty"), 8).alias("a"),
            quadkey_from_xyz_expr(
                F.floor(F.col("tx") / 2), F.floor(F.col("ty") / 2), 7
            ).alias("b"),
        ).collect()[0]
        assert qk8[:7] == qk7  # zoom-out == string truncation

    def test_lonlat_tiles_clamped(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.functions.spatialkeys import lonlat_to_tile_expr

        df = spark.createDataFrame(
            [(0.0, 0.0), (-180.0, 85.05), (179.999, -85.05)], "lon double, lat double"
        )
        tx, ty = lonlat_to_tile_expr(F.col("lon"), F.col("lat"), 2)
        rows = df.select(tx.alias("tx"), ty.alias("ty")).collect()
        assert (rows[0]["tx"], rows[0]["ty"]) == (2, 2)  # greenwich/equator
        assert (rows[1]["tx"], rows[1]["ty"]) == (0, 0)
        assert (rows[2]["tx"], rows[2]["ty"]) == (3, 3)
