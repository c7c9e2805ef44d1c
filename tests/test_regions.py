"""Distributed region labeling: cross-block stitching attacked with
shapes that snake over borders, plus connectivity-rule checks."""

from __future__ import annotations

import numpy as np
import pytest

from geocube_spark.operators.regions import region_components, region_stats


def _tiles(spark, grid: np.ndarray, b: int):
    h, w = grid.shape
    rows = []
    for by in range(h // b):
        for bx in range(w // b):
            rows.append(
                (bx, by, grid[by * b : (by + 1) * b, bx * b : (bx + 1) * b].ravel().tolist())
            )
    return spark.createDataFrame(
        rows, "block_x int, block_y int, px array<double>"
    )


class TestRegionLabeling:
    def test_plus_shape_spans_four_blocks(self, spark):
        b = 16
        g = np.zeros((32, 32))
        g[14:18, :] = 1.0
        g[:, 14:18] = 1.0
        out = {r["val"]: r for r in region_stats(_tiles(spark, g, b), block=b).collect()}
        assert out[1.0]["n_regions"] == 1
        assert out[1.0]["n_pixels"] == 240  # 128 + 128 - 16 overlap
        assert out[0.0]["n_regions"] == 4
        assert out[0.0]["max_region_px"] == 196

    def test_diagonal_cells_do_not_merge(self, spark):
        # two 1-valued squares touching only at a corner ON the block
        # boundary: 4-connectivity must keep them separate
        b = 8
        g = np.zeros((16, 16))
        g[6:8, 6:8] = 1.0    # ends at the corner (7,7)
        g[8:10, 8:10] = 1.0  # starts at (8,8) — diagonal touch only
        out = {r["val"]: r for r in region_stats(_tiles(spark, g, b), block=b).collect()}
        assert out[1.0]["n_regions"] == 2

    def test_snake_through_all_blocks_is_one_region(self, spark):
        # a 1-px path entering and leaving blocks repeatedly
        b = 8
        g = np.zeros((16, 16))
        g[3, 0:14] = 1.0     # east across the vertical border
        g[3:12, 13] = 1.0    # south across the horizontal border
        g[11, 2:14] = 1.0    # west back across
        g[5:12, 2] = 1.0     # north back up
        out = {r["val"]: r for r in region_stats(_tiles(spark, g, b), block=b).collect()}
        assert out[1.0]["n_regions"] == 1

    def test_uniform_raster_single_region(self, spark):
        b = 8
        g = np.full((16, 16), 7.0)
        rows = region_stats(_tiles(spark, g, b), block=b).collect()
        assert len(rows) == 1
        assert rows[0]["n_regions"] == 1 and rows[0]["n_pixels"] == 256

    def test_component_ids_are_min_root_coords(self, spark):
        b = 8
        g = np.zeros((8, 16))
        g[0, :] = 1.0  # top row across both blocks
        comps = region_components(_tiles(spark, g, b), block=b).collect()
        one = [c for c in comps if c["val"] == 1.0]
        assert len(one) == 1
        # min provisional label = root of pixel (0,0): (0 << 32) | 0 = 0
        assert one[0]["component"] == 0


class TestSieve:
    def test_small_specks_removed_large_kept(self, spark):
        import math

        b = 8
        g = np.zeros((16, 16))
        g[2, 2] = 1.0                  # 1-px speck
        g[7:9, 7:9] = 1.0              # 4-px region straddling all 4 blocks
        g[12:16, 12:16] = 1.0          # 16-px region
        from geocube_spark.operators.regions import sieve_mask

        out = sieve_mask(_tiles(spark, g, b), min_px=4, block=b).collect()
        full = np.zeros((16, 16))
        for r in out:
            full[
                r["block_y"] * b : (r["block_y"] + 1) * b,
                r["block_x"] * b : (r["block_x"] + 1) * b,
            ] = np.array(r["px"]).reshape(b, b)
        assert math.isnan(full[2, 2])          # speck sieved
        assert full[7, 7] == 1.0               # 4-px cross-block region kept
        assert full[13, 13] == 1.0             # big region kept
        assert full[0, 0] == 0.0               # background untouched (large)

    def test_threshold_counts_cross_block_size(self, spark):
        """A region of 4 px split 1+1+1+1 across four blocks must be
        judged by its TOTAL size, not its per-block fragments."""
        import math

        from geocube_spark.operators.regions import sieve_mask

        b = 8
        g = np.zeros((16, 16))
        g[7:9, 7:9] = 5.0

        def rebuild(rows):
            full = np.zeros((16, 16))
            for r in rows:
                full[
                    r["block_y"] * b : (r["block_y"] + 1) * b,
                    r["block_x"] * b : (r["block_x"] + 1) * b,
                ] = np.array(r["px"]).reshape(b, b)
            return full

        kept = rebuild(sieve_mask(_tiles(spark, g, b), min_px=4, block=b).collect())
        assert all(kept[y, x] == 5.0 for y in (7, 8) for x in (7, 8))

        gone = rebuild(sieve_mask(_tiles(spark, g, b), min_px=5, block=b).collect())
        assert all(math.isnan(gone[y, x]) for y in (7, 8) for x in (7, 8))
        assert gone[0, 0] == 0.0  # background survives


class TestSieveDistributed:
    """The sieve rewrite pass is fully distributed: sub-threshold labels
    travel to their owning block through an equi-join, never through a
    driver collect — so an all-speckle raster (every pixel its own
    region) is bounded by per-block memory, not driver memory."""

    def test_all_speckle_checkerboard(self, spark):
        import math

        b = 8
        # 16x16 checkerboard of 4 values -> every pixel is a 1-px region
        yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        g = ((yy % 2) * 2 + (xx % 2)).astype(np.float64)
        from geocube_spark.operators.regions import sieve_mask

        out = sieve_mask(_tiles(spark, g, b), min_px=2, block=b).collect()
        assert len(out) == 4
        for r in out:
            # Arrow surfaces NaN list elements as None on collect (they
            # round-trip back to NaN through numpy float casts)
            assert all(
                v is None or math.isnan(v) for v in r["px"]
            )  # everything sieved

    def test_rewrite_plan_has_no_driver_collect(self, spark, monkeypatch):
        # the small-label list must reach the rewrite tasks through a
        # JOIN, never a driver collect (the old implementation
        # collect()ed it at plan build; label-merge rounds may still run
        # eager localCheckpoint jobs — those are not collects)
        import math

        from pyspark.sql import DataFrame

        from geocube_spark.operators.regions import sieve_mask

        def no_collect(self_df):
            raise AssertionError("sieve_mask must not collect() on the driver")

        monkeypatch.setattr(DataFrame, "collect", no_collect)
        g = np.zeros((16, 16))
        g[2, 2] = 1.0
        df = sieve_mask(_tiles(spark, g, 8), min_px=4, block=8)
        monkeypatch.undo()
        rows = df.collect()
        full = np.zeros((16, 16))
        for r in rows:
            full[
                r["block_y"] * 8 : (r["block_y"] + 1) * 8,
                r["block_x"] * 8 : (r["block_x"] + 1) * 8,
            ] = np.array(r["px"], dtype=np.float64).reshape(8, 8)
        assert math.isnan(full[2, 2]) and full[0, 0] == 0.0


class TestPolygonize:
    """Boundary geometry from the labeled segmentation: perimeter and
    Euler-characteristic holes, stitched across block borders."""

    def test_cross_block_snake(self, spark):
        # a 1-px snake winding through all four 8x8 blocks: one region,
        # perimeter = 2*n_px + 2 (width-1 path, no holes)
        g = np.zeros((16, 16))
        path = [(7, j) for j in range(1, 15)] + [(i, 14) for i in range(8, 13)]
        for i, j in path:
            g[i, j] = 5.0
        from geocube_spark.operators.regions import polygonize_report

        rows = {r["val"]: r for r in polygonize_report(_tiles(spark, g, 8), block=8).collect()}
        n = len(path)
        assert rows[5.0]["n_regions"] == 1  # stitched across all borders
        assert rows[5.0]["n_px"] == n
        assert rows[5.0]["perimeter"] == 2 * n + 2
        assert rows[5.0]["n_holes"] == 0

    def test_donut_crossing_blocks_has_one_hole(self, spark):
        g = np.zeros((16, 16))
        g[5:11, 5:11] = 2.0   # 6x6 outer, crossing the center corner
        g[7:9, 7:9] = 0.0     # 2x2 hole
        from geocube_spark.operators.regions import polygonize_report

        rows = {r["val"]: r for r in polygonize_report(_tiles(spark, g, 8), block=8).collect()}
        assert rows[2.0]["n_px"] == 32 and rows[2.0]["n_holes"] == 1
        assert rows[2.0]["perimeter"] == 24 + 8
        # the background: one region (hole is enclosed by val2 -> separate
        # background region? no — the 2x2 hole IS background, disconnected)
        assert rows[0.0]["n_regions"] == 2
        assert rows[0.0]["n_holes"] == 1  # outer background encloses the donut

    def test_agrees_with_region_stats(self, spark):
        rng = np.random.RandomState(7)
        g = (rng.rand(16, 16) > 0.5).astype(float)
        from geocube_spark.operators.regions import (
            polygonize_report,
            region_stats,
        )

        poly = {r["val"]: r for r in polygonize_report(_tiles(spark, g, 8), block=8).collect()}
        stats = {r["val"]: r for r in region_stats(_tiles(spark, g, 8), block=8).collect()}
        for v in stats:
            assert poly[v]["n_regions"] == stats[v]["n_regions"]
            assert poly[v]["n_px"] == stats[v]["n_pixels"]


class TestPolygonizeWkb:
    """Full vectorization: each region becomes a Polygon WKB whose
    shoelace area equals its pixel count and whose ring structure matches
    the shape (donut -> exterior + 1 hole)."""

    def test_rect_exact_ring(self, spark):
        import numpy as np

        from geocube_spark.functions.geometry import decode_wkb_polygons
        from geocube_spark.operators.regions import polygonize_wkb

        g = np.zeros((16, 16))
        g[2:5, 3:7] = 1.0  # 3 rows x 4 cols at (y=2, x=3)
        rows = {r["val"]: r for r in polygonize_wkb(_tiles(spark, g, 8), block=8).collect()}
        r = rows[1.0]
        assert r["n_rings"] == 1 and r["area"] == 12.0
        rings = decode_wkb_polygons(r["wkb"])[0]
        pts = {tuple(p) for p in rings[0].tolist()}
        # the 4 rectangle corners all present, nothing outside the bbox
        assert {(3.0, 2.0), (7.0, 2.0), (7.0, 5.0), (3.0, 5.0)} <= pts
        assert all(3 <= x <= 7 and 2 <= y <= 5 for x, y in pts)

    def test_donut_hole_ring(self, spark):
        import numpy as np

        from geocube_spark.functions.geometry import decode_wkb_polygons
        from geocube_spark.operators.regions import polygonize_wkb

        g = np.zeros((16, 16))
        g[5:11, 5:11] = 2.0
        g[7:9, 7:9] = 0.0
        rows = {r["val"]: r for r in polygonize_wkb(_tiles(spark, g, 8), block=8).collect()
                if r["val"] == 2.0}
        r = rows[2.0]
        assert r["n_rings"] == 2
        assert r["area"] == 32.0  # 36 - 4
        rings = decode_wkb_polygons(r["wkb"])[0]
        assert len(rings) == 2
        hole = {tuple(p) for p in rings[1].tolist()}
        assert {(7.0, 7.0), (9.0, 7.0), (9.0, 9.0), (7.0, 9.0)} <= hole

    def test_area_identity_matches_pixel_count(self, spark):
        import numpy as np

        from geocube_spark.operators.regions import (
            polygonize_wkb,
            region_components,
        )

        rng = np.random.RandomState(11)
        g = (rng.rand(16, 16) > 0.6).astype(float)
        wkbs = polygonize_wkb(_tiles(spark, g, 8), block=8).collect()
        comps = {
            (r["val"], r["component"]): r["n_px"]
            for r in region_components(_tiles(spark, g, 8), block=8).collect()
        }
        assert len(wkbs) == len(comps)
        for r in wkbs:
            assert r["area"] == comps[(r["val"], r["component"])]


class TestSimplifyWkb:
    def test_rect_reduces_to_4_corners(self, spark):
        import numpy as np

        from geocube_spark.functions.geometry import decode_wkb_polygons
        from geocube_spark.operators.regions import polygonize_wkb, simplify_wkb

        g = np.zeros((16, 16))
        g[2:5, 3:7] = 1.0
        out = simplify_wkb(
            polygonize_wkb(_tiles(spark, g, 8), block=8).filter("val = 1.0")
        ).collect()
        rings = decode_wkb_polygons(out[0]["wkb"])[0]
        pts = [tuple(p) for p in rings[0].tolist()]
        assert len(pts) == 5 and pts[0] == pts[-1]  # 4 corners, closed
        assert set(pts) == {(3.0, 2.0), (7.0, 2.0), (7.0, 5.0), (3.0, 5.0)}

    def test_donut_hole_reduces_too(self, spark):
        import numpy as np

        from geocube_spark.functions.geometry import decode_wkb_polygons
        from geocube_spark.operators.regions import polygonize_wkb, simplify_wkb

        g = np.zeros((16, 16))
        g[5:11, 5:11] = 2.0
        g[7:9, 7:9] = 0.0
        out = simplify_wkb(
            polygonize_wkb(_tiles(spark, g, 8), block=8).filter("val = 2.0")
        ).collect()
        rings = decode_wkb_polygons(out[0]["wkb"])[0]
        assert len(rings[0]) == 5 and len(rings[1]) == 5

    def test_tolerance_cuts_staircase(self, spark):
        import numpy as np

        from geocube_spark.functions.geometry import decode_wkb_polygons
        from geocube_spark.operators.regions import polygonize_wkb, simplify_wkb

        # a pixel staircase: diagonal band i==j..j+1 over 8 rows
        g = np.zeros((16, 16))
        for i in range(8):
            g[i, i] = 3.0
            g[i, i + 1] = 3.0
        base = polygonize_wkb(_tiles(spark, g, 8), block=8).filter("val = 3.0")
        exact = decode_wkb_polygons(
            simplify_wkb(base, 0.0).collect()[0]["wkb"]
        )[0][0]
        coarse = decode_wkb_polygons(
            simplify_wkb(base, 1.0).collect()[0]["wkb"]
        )[0][0]
        assert len(coarse) < len(exact)  # tolerance collapses the stairs


class TestRasterVectorRoundTrip:
    """Raster -> polygonize -> simplify -> vector zone -> zonal stats over
    the source raster: the end-to-end loop an EO analyst runs (segment a
    class map, then aggregate another band over the segments)."""

    def test_polygonized_zone_drives_zonal_stats(self, spark):
        import numpy as np

        from geocube_spark.functions.geometry import decode_wkb_polygons
        from geocube_spark.operators.regions import polygonize_wkb, simplify_wkb
        from geocube_spark.operators.zonal import zonal_stats

        b = 8
        # class mask: one rectangular segment (rows 2..5, cols 3..6)
        mask = np.zeros((16, 16))
        mask[2:6, 3:7] = 1.0

        def tiles_from(grid):
            rows = []
            for by in range(2):
                for bx in range(2):
                    v = grid[by * b:(by + 1) * b, bx * b:(bx + 1) * b].ravel().tolist()
                    rows.append((bx, by, v, {"a": 1.0, "b": 0.0, "c": 0.0,
                                             "d": 0.0, "e": -1.0, "f": 16.0}))
            return spark.createDataFrame(
                rows,
                "block_x int, block_y int, px array<double>, "
                "pix_to_crs struct<a:double,b:double,c:double,d:double,e:double,f:double>",
            )

        seg = simplify_wkb(
            polygonize_wkb(tiles_from(mask), block=b).filter("val = 1.0")
        ).collect()[0]
        ring = decode_wkb_polygons(seg["wkb"])[0][0]
        xs = [p[0] for p in ring.tolist()]
        ys_row = [p[1] for p in ring.tolist()]  # row coords (y down)
        # vector zone in the raster CRS: x = col, y = 16 - row
        zone = spark.createDataFrame(
            [(0, min(xs), 16.0 - max(ys_row), max(xs), 16.0 - min(ys_row))],
            "zone_id int, xmin double, ymin double, xmax double, ymax double",
        )
        # value band: gradient value = row*16 + col
        cc, rr = np.meshgrid(np.arange(16), np.arange(16))
        band = (rr * 16.0 + cc).astype(float)
        out = zonal_stats(tiles_from(band), zone, block=b).collect()[0]
        want = band[2:6, 3:7]
        assert out["n_pixels"] == want.size
        assert out["mean_value"] == want.mean()
        assert out["min_value"] == want.min() and out["max_value"] == want.max()


class TestContours:
    """Marching squares: open contour on a gradient, closed ring crossing
    block borders, and the 2-segment saddle case."""

    def _tiles(self, spark, grid, b):
        rows = []
        n = grid.shape[0] // b
        for by in range(n):
            for bx in range(n):
                rows.append(
                    (bx, by, grid[by * b:(by + 1) * b, bx * b:(bx + 1) * b]
                     .ravel().tolist())
                )
        return spark.createDataFrame(
            rows, "block_x int, block_y int, px array<double>"
        )

    def test_linear_gradient_open_line(self, spark):
        import numpy as np

        from geocube_spark.operators.contours import contour_report

        g = np.tile(np.arange(16.0)[:, None], (1, 16))  # value = row
        out = contour_report(self._tiles(spark, g, 8), [3.5], block=8).collect()[0]
        # horizontal line at y=3.5 across the 15 interior cells: one open
        # polyline, length 15
        assert out["n_polylines"] == 1
        assert out["n_segments"] == 15
        assert out["total_length"] == 15.0

    def test_saddle_emits_two_segments(self, spark):
        import numpy as np

        from geocube_spark.operators.contours import contour_segments

        g = np.zeros((8, 8))
        g[3, 3] = 1.0
        g[4, 4] = 1.0  # diagonal highs -> saddle cell at (3,3)
        segs = contour_segments(self._tiles(spark, g, 8), [0.5], block=8).collect()
        per_cell = [
            s for s in segs
            if 3.0 <= min(s["x1"], s["x2"]) and max(s["x1"], s["x2"]) <= 4.0
            and 3.0 <= min(s["y1"], s["y2"]) and max(s["y1"], s["y2"]) <= 4.0
        ]
        assert len(per_cell) == 2  # the ambiguous cell yields 2 segments

    def test_ring_crossing_blocks_closed(self, spark):
        import numpy as np

        from geocube_spark.operators.contours import contour_report

        cc, rr = np.meshgrid(np.arange(16.0), np.arange(16.0))
        g = np.maximum(np.abs(rr - 8), np.abs(cc - 8))  # Chebyshev cone at (8,8)
        out = contour_report(self._tiles(spark, g, 8), [2.5], block=8).collect()[0]
        assert out["n_polylines"] == 1
        assert out["n_segments"] == 20  # 8L = 20
        assert abs(out["total_length"] - (8 * 2.5 - 4 + 2 * 2 ** 0.5)) < 1e-6


class TestLabelBlockVectorizedParity:
    """The Shiloach-Vishkin-style vectorized block labeler must reproduce
    the scalar union-by-min union-find exactly (root = component's min
    flat index), including on serpentine regions that maximize the
    propagation diameter."""

    @staticmethod
    def _scalar_ref(px):
        import numpy as np

        h, w = px.shape
        parent = np.arange(h * w, dtype=np.int64)

        def find(i):
            r = i
            while parent[r] != r:
                r = parent[r]
            while parent[i] != r:
                parent[i], i = r, parent[i]
            return r

        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x and px[y, x] == px[y, x - 1]:
                    ra, rb = find(i), find(i - 1)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
                if y and px[y, x] == px[y - 1, x]:
                    ra, rb = find(i), find(i - w)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        return np.array([find(i) for i in range(h * w)], dtype=np.int64)

    def test_random_checker_and_snake_equal(self):
        import numpy as np

        from geocube_spark.operators.regions import _label_block

        rng = np.random.default_rng(11)
        cases = [
            rng.integers(0, k, (h, w)).astype(float)
            for k in (2, 5)
            for h, w in ((17, 23), (32, 32))
        ]
        cases.append((np.indices((16, 16)).sum(0) % 2).astype(float))
        snake = np.ones((16, 16))
        snake[::2, :] = 0
        snake[1::4, -1] = 0
        snake[3::4, 0] = 0  # one serpentine region spanning the block
        cases.append(snake)
        for c in cases:
            np.testing.assert_array_equal(_label_block(c), self._scalar_ref(c))


class TestContoursVectorizedParity:
    """The numpy case-table march must reproduce the scalar per-cell
    reference exactly (same IEEE interpolation) — guards the vectorized
    refactor across all 16 cases including saddles, on a 256² block."""

    @staticmethod
    def _scalar_march(grid, level):
        import numpy as np

        h, w = grid.shape
        segs = []
        for ci in range(h - 1):
            for cj in range(w - 1):
                v00, v01 = grid[ci, cj], grid[ci, cj + 1]
                v10, v11 = grid[ci + 1, cj], grid[ci + 1, cj + 1]
                case = (
                    (v00 > level)
                    | ((v01 > level) << 1)
                    | ((v11 > level) << 2)
                    | ((v10 > level) << 3)
                )
                if case in (0, 15):
                    continue
                x, y = cj, ci

                def it(va, vb):
                    with np.errstate(divide="ignore", invalid="ignore"):
                        return (level - va) / (vb - va)

                T = (x + it(v00, v01), float(y))
                B = (x + it(v10, v11), float(y + 1))
                L = (float(x), y + it(v00, v10))
                R = (float(x + 1), y + it(v01, v11))
                table = {
                    1: [(L, T)], 14: [(L, T)], 2: [(T, R)], 13: [(T, R)],
                    4: [(R, B)], 11: [(R, B)], 8: [(B, L)], 7: [(B, L)],
                    3: [(L, R)], 12: [(L, R)], 6: [(T, B)], 9: [(T, B)],
                    5: [(L, B), (T, R)], 10: [(L, T), (R, B)],
                }
                for (ax, ay), (bx, by) in table[int(case)]:
                    segs.append((float(ax), float(ay), float(bx), float(by)))
        return sorted(segs)

    def test_random_field_256_block_exact(self, spark):
        import numpy as np

        from geocube_spark.operators.contours import contour_segments

        rng = np.random.default_rng(7)
        b = 256
        # smooth-ish random field quantized to .25 steps: plateaus force
        # every marching case incl. both saddle orientations
        g = np.round(rng.random((b, b)) * 8) / 4.0
        tiles = spark.createDataFrame(
            [(0, 0, g.ravel().tolist())],
            "block_x int, block_y int, px array<double>",
        )
        level = 1.0
        got = sorted(
            (r["x1"], r["y1"], r["x2"], r["y2"])
            for r in contour_segments(tiles, [level], block=b).collect()
        )
        assert got == self._scalar_march(g, level)
        assert len(got) > 10000  # the fixture genuinely exercises scale


class TestSimplifyAreaInvariant:
    def test_collinear_removal_preserves_area_random_masks(self, spark):
        import numpy as np

        from geocube_spark.functions.geometry import decode_wkb_polygons
        from geocube_spark.operators.regions import polygonize_wkb, simplify_wkb

        def shoelace(arr):
            x, y = arr[:, 0], arr[:, 1]
            return 0.5 * abs(
                float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
            )

        for seed in (3, 17):
            rng = np.random.RandomState(seed)
            g = (rng.rand(16, 16) > 0.55).astype(float)
            base = polygonize_wkb(_tiles(spark, g, 8), block=8)
            simp = simplify_wkb(base, 0.0)
            areas_b = {
                (r["val"], r["component"]): r["area"] for r in base.collect()
            }
            for r in simp.collect():
                rings = decode_wkb_polygons(r["wkb"])[0]
                # closed rings: drop the repeated last point for shoelace
                area = shoelace(rings[0][:-1]) - sum(
                    shoelace(h[:-1]) for h in rings[1:]
                )
                assert abs(area - areas_b[(r["val"], r["component"])]) < 1e-9
