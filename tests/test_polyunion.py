"""Exact rectilinear union kernel (functions/polyunion.py) + the A1
union_footprints aggregation (operators/consolidation.py)."""

from __future__ import annotations

import numpy as np
import pytest

from geocube_spark.functions.geometry import decode_wkb_polygons
from geocube_spark.functions.polyunion import (
    _ring_signed_area,
    rect_union,
    union_wkb,
)


class TestRectUnion:
    def test_inclusion_exclusion_two_rects(self):
        polys, area = rect_union([(0, 0, 10, 10), (5, 5, 15, 15)])
        assert area == 100 + 100 - 25
        assert len(polys) == 1 and not polys[0][1]

    def test_disjoint_rects_two_polygons(self):
        polys, area = rect_union([(0, 0, 1, 1), (5, 5, 6, 6)])
        assert area == 2.0 and len(polys) == 2

    def test_frame_produces_hole(self):
        frame = [(0, 0, 10, 2), (0, 8, 10, 10), (0, 0, 2, 10), (8, 0, 10, 10)]
        polys, area = rect_union(frame)
        assert area == 100 - 36
        assert len(polys) == 1 and len(polys[0][1]) == 1
        outer, holes = polys[0]
        assert _ring_signed_area(outer) > 0  # CCW outer
        assert _ring_signed_area(holes[0]) < 0  # CW hole
        assert _ring_signed_area(holes[0]) == -36

    def test_diagonal_touch_stays_separate(self):
        polys, area = rect_union([(0, 0, 1, 1), (1, 1, 2, 2)])
        assert area == 2.0 and len(polys) == 2

    def test_idempotent_and_degenerate(self):
        polys, area = rect_union([(0, 0, 4, 4), (0, 0, 4, 4), (1, 1, 1, 3)])
        assert area == 16.0 and len(polys) == 1
        assert rect_union([]) == ([], 0.0)

    def test_fuzz_against_integer_rasterization(self):
        rng = np.random.RandomState(7)
        for _ in range(100):
            rs = []
            for _ in range(rng.randint(1, 10)):
                x0, y0 = rng.randint(0, 24, 2)
                w, h = rng.randint(1, 12, 2)
                rs.append((float(x0), float(y0), float(x0 + w), float(y0 + h)))
            polys, area = rect_union(rs)
            grid = np.zeros((40, 40), dtype=bool)
            for x0, y0, x1, y1 in rs:
                grid[int(x0):int(x1), int(y0):int(y1)] = True
            assert area == float(grid.sum())
            # shoelace of all rings equals the grid area (outers - holes)
            total = sum(
                _ring_signed_area(outer) + sum(_ring_signed_area(h) for h in holes)
                for outer, holes in polys
            )
            assert total == pytest.approx(area)

    def test_wkb_roundtrip(self):
        frame = [(0, 0, 10, 2), (0, 8, 10, 10), (0, 0, 2, 10), (8, 0, 10, 10)]
        polys, _ = rect_union(frame)
        decoded = decode_wkb_polygons(union_wkb(polys))
        assert len(decoded) == 1
        rings = decoded[0]
        assert len(rings) == 2  # outer + hole
        np.testing.assert_array_equal(rings[0], polys[0][0])
        np.testing.assert_array_equal(rings[1], polys[0][1][0])


class TestUnionFootprints:
    def test_true_union_vs_envelope(self, spark):
        from geocube_spark.operators.consolidation import union_footprints

        rows = [
            ("j1", (0.0, 0.0, 10.0, 2.0)),
            ("j1", (0.0, 8.0, 10.0, 10.0)),
            ("j1", (0.0, 0.0, 2.0, 10.0)),
            ("j1", (8.0, 0.0, 10.0, 10.0)),
            ("j2", (0.0, 0.0, 1.0, 1.0)),
        ]
        df = spark.createDataFrame(
            rows,
            "job_id STRING, bbox STRUCT<xmin:DOUBLE,ymin:DOUBLE,xmax:DOUBLE,ymax:DOUBLE>",
        )
        out = {r["job_id"]: r for r in union_footprints(df, ["job_id"]).collect()}
        j1 = out["j1"]
        assert j1["union_area"] == 64.0  # frame: envelope would say 100
        assert j1["n_polygons"] == 1 and j1["n_holes"] == 1
        assert (j1["xmin"], j1["ymin"], j1["xmax"], j1["ymax"]) == (0, 0, 10, 10)
        decoded = decode_wkb_polygons(bytes(j1["union_wkb"]))
        assert len(decoded) == 1 and len(decoded[0]) == 2
        j2 = out["j2"]
        assert j2["union_area"] == 1.0 and j2["n_polygons"] == 1 and j2["n_holes"] == 0


class TestPolyUnionGeneral:
    """Vertical-slab union of ARBITRARY simple polygons (rotated quads)."""

    @staticmethod
    def _diamond(cx, cy, r):
        return [(cx - r, cy), (cx, cy - r), (cx + r, cy), (cx, cy + r)]

    @staticmethod
    def _rot(poly, th, cx=0.0, cy=0.0):
        c, s = np.cos(th), np.sin(th)
        return [
            (cx + c * (x - cx) - s * (y - cy), cy + s * (x - cx) + c * (y - cy))
            for x, y in poly
        ]

    def test_two_overlapping_diamonds_lens_area(self):
        from geocube_spark.functions.polyunion import poly_union

        r, d = 2.0, 3.0
        polys, area = poly_union([self._diamond(0, 0, r), self._diamond(d, 0, r)])
        assert area == pytest.approx(2 * (2 * r * r) - (2 * r - d) ** 2 / 2)
        assert len(polys) == 1 and not polys[0][1]

    def test_nested_diamond_absorbed(self):
        from geocube_spark.functions.polyunion import poly_union

        polys, area = poly_union([self._diamond(0, 0, 4), self._diamond(0, 0, 1)])
        assert area == pytest.approx(32.0) and len(polys) == 1

    def test_disjoint_rotated_quads(self):
        from geocube_spark.functions.polyunion import poly_union

        a = self._rot([(0, 0), (2, 0), (2, 1), (0, 1)], 0.5)
        b = self._rot([(10, 10), (13, 10), (13, 12), (10, 12)], 1.1)
        polys, area = poly_union([a, b])
        assert area == pytest.approx(2 * 1 + 3 * 2)
        assert len(polys) == 2

    def test_rotated_annulus_one_hole(self):
        from geocube_spark.functions.polyunion import poly_union

        outer, inner = 10.0, 6.0
        t = (outer - inner) / 2
        rects = [
            [(0, 0), (outer, 0), (outer, t), (0, t)],
            [(0, outer - t), (outer, outer - t), (outer, outer), (0, outer)],
            [(0, 0), (t, 0), (t, outer), (0, outer)],
            [(outer - t, 0), (outer, 0), (outer, outer), (outer - t, outer)],
        ]
        polys, area = poly_union(
            [self._rot(p, np.pi / 6, 5, 5) for p in rects]
        )
        assert area == pytest.approx(outer**2 - inner**2)
        assert len(polys) == 1 and len(polys[0][1]) == 1

    def test_cross_validates_rect_union_on_random_rects(self):
        """Property: on rectilinear inputs the slab kernel must agree with
        the dedicated rectilinear kernel on area, components, and holes."""
        from geocube_spark.functions.polyunion import poly_union

        rng = np.random.default_rng(0)
        for trial in range(25):
            n = int(rng.integers(1, 12))
            rects, polys_in = [], []
            for _ in range(n):
                x0, y0 = rng.uniform(0, 50, 2)
                w, h = rng.uniform(1, 20, 2)
                rects.append((x0, y0, x0 + w, y0 + h))
                polys_in.append(
                    [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]
                )
            pr, ar = rect_union(rects)
            pp, ap = poly_union(polys_in)
            assert ap == pytest.approx(ar, rel=1e-9), trial
            assert len(pp) == len(pr), trial
            assert sum(len(h) for _, h in pp) == sum(
                len(h) for _, h in pr
            ), trial

    def test_shoelace_consistency_is_asserted(self):
        """The kernel self-checks trapezoid area against traced-ring
        shoelace area — random rotated quads keep them equal."""
        from geocube_spark.functions.polyunion import poly_union

        rng = np.random.default_rng(1)
        for _ in range(10):
            polys_in = []
            for _ in range(int(rng.integers(2, 8))):
                cx, cy = rng.uniform(0, 30, 2)
                w, h = rng.uniform(1, 8, 2)
                th = rng.uniform(0, np.pi)
                base = [
                    (cx, cy), (cx + w, cy), (cx + w, cy + h), (cx, cy + h)
                ]
                polys_in.append(self._rot(base, th, cx, cy))
            _, area = poly_union(polys_in)  # raises if inconsistent
            assert area > 0

    def test_clip_poly_rect_half_diamond(self):
        from geocube_spark.functions.polyunion import clip_poly_rect, poly_union

        clipped = clip_poly_rect(self._diamond(0, 0, 2), 0, -3, 3, 3)
        _, a = poly_union([clipped])
        assert a == pytest.approx(4.0)  # half of 2r² = 8


class TestRectBuffer:
    def test_dilate_square(self):
        from geocube_spark.functions.polyunion import rect_buffer

        polys, a = rect_buffer([(0, 0, 10, 10)], 1.0)
        assert a == 144.0 and len(polys) == 1

    def test_erode_square(self):
        from geocube_spark.functions.polyunion import rect_buffer

        polys, a = rect_buffer([(0, 0, 10, 10)], -2.0)
        assert a == 36.0 and len(polys) == 1

    def test_erode_l_shape_analytic(self):
        from geocube_spark.functions.polyunion import rect_buffer

        # L = (0,0,10,4) U (0,0,4,10); unit-square erosion:
        # (1,1,9,3) U (1,1,3,9) -> 16 + 16 - 4 = 28
        _, a = rect_buffer([(0, 0, 10, 4), (0, 0, 4, 10)], -1.0)
        assert a == 28.0

    def test_erosion_extinction(self):
        from geocube_spark.functions.polyunion import rect_buffer

        polys, a = rect_buffer([(0, 0, 3, 3)], -2.0)
        assert a == 0.0 and polys == []

    def test_dilate_erode_roundtrip_on_fat_region(self):
        from geocube_spark.functions.polyunion import rect_buffer, rect_union

        # opening a convex rect returns it exactly
        rects = [(0.0, 0.0, 8.0, 6.0)]
        _, orig = rect_union(rects)
        _, opened = rect_buffer([(-1, -1, 9, 7)], -1.0)  # dilated then eroded
        assert opened == orig

    def test_erode_splits_dumbbell(self):
        from geocube_spark.functions.polyunion import rect_buffer

        # two 6x6 lobes joined by a thin 2-wide bridge: erosion by 1.5
        # severs the bridge -> two components
        rects = [(0, 0, 6, 6), (10, 0, 16, 6), (6, 2, 10, 4)]
        polys, a = rect_buffer(rects, -1.5)
        assert len(polys) == 2
        assert a == 2 * 3.0 * 3.0  # each lobe erodes to 3x3
