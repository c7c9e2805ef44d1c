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
