"""CRS kernel (C6/R4/R5), URI utils (C13), PNG sink (S7), tag ops (C11),
extended resampling kernels (R3)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.crs import (
    CRSError,
    crs_from_parameters,
    laea_forward,
    laea_inverse,
    parse_crs,
    snap_transform,
    transform_points,
    warped_extent,
)
from geocube_spark.functions.uri import gdal_uri, split_gdal_uri, url_join, validate_urn
from geocube_spark.sources.catalog import update_record_tags
from geocube_spark.sources.png import encode_png, slice_to_png


class TestCRS:
    def test_parse(self):
        assert parse_crs("epsg:4326") == 4326
        assert parse_crs("EPSG: 3857") == 3857
        assert parse_crs(32631) == 32631
        assert parse_crs("+proj=utm +zone=31") == 32631
        assert parse_crs("+proj=utm +zone=19 +south +datum=WGS84") == 32719
        with pytest.raises(CRSError):
            parse_crs("+proj=utm +zone=31 +ellps=GRS80")  # non-WGS84 datum
        with pytest.raises(CRSError):
            parse_crs("+proj=utm")  # no zone

    def test_parse_wkt1_authority(self):
        wkt = (
            'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
            '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
            'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",'
            '0.0174532925199433,AUTHORITY["EPSG","9122"]],AUTHORITY["EPSG","4326"]]'
        )
        # outermost AUTHORITY (the last clause) wins, not the spheroid's
        assert parse_crs(wkt) == 4326

    def test_parse_wkt2_id(self):
        wkt2 = 'GEOGCRS["WGS 84",DATUM["WGS 84"],CS[ellipsoidal,2],ID["EPSG",4326]]'
        assert parse_crs(wkt2) == 4326
        with pytest.raises(CRSError):
            parse_crs('PROJCS["no authority here",UNIT["metre",1]]')

    def test_parse_proj4(self):
        assert parse_crs("+init=epsg:32631 +units=m") == 32631
        assert parse_crs("+proj=longlat +datum=WGS84 +no_defs") == 4326
        assert (
            parse_crs("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1")
            == 3857
        )

    def test_webmercator_roundtrip(self):
        xs = np.array([0.0, 10.0, -120.0])
        ys = np.array([0.0, 45.0, -60.0])
        mx, my = transform_points(4326, 3857, xs, ys)
        bx, by = transform_points(3857, 4326, mx, my)
        np.testing.assert_allclose(bx, xs, atol=1e-9)
        np.testing.assert_allclose(by, ys, atol=1e-9)

    def test_known_point(self):
        mx, my = transform_points(4326, 3857, np.array([180.0]), np.array([0.0]))
        assert mx[0] == pytest.approx(20037508.342789244)
        assert my[0] == pytest.approx(0.0, abs=1e-6)

    def test_unregistered_raises(self):
        # Belgian Lambert 72 (LCC on a datum-shifted ellipsoid) is not a
        # built-in family member and not registered
        with pytest.raises(CRSError):
            transform_points(4326, 31370, np.array([0.0]), np.array([0.0]))

    def test_warped_extent_edge_bow(self):
        """R4: at high latitude the top edge of a lon/lat rect bows in
        mercator — densified extent must be >= the corner-only extent."""
        xmin, ymin, xmax, ymax = warped_extent(4326, 3857, -10, 40, 10, 60)
        cx, cy = transform_points(
            4326, 3857, np.array([-10.0, 10.0]), np.array([40.0, 60.0])
        )
        assert ymax >= cy.max() and ymin <= cy.min()
        assert xmin == pytest.approx(cx.min())

    def test_snap_transform(self):
        ox, oy, w, h = snap_transform(3.0, 2.0, 21.0, 17.0, resolution=1.0, block=8)
        assert ox == 0.0 and oy == 24.0  # snapped to 8-unit grid
        assert w % 8 == 0 and h % 8 == 0
        assert ox + w >= 21.0 and oy - h <= 2.0  # covers the extent


class TestTransverseMercator:
    """Closed-form UTM (Krüger order-n⁶ series, crs.py).  Verified three
    independent ways: forward/inverse roundtrip at machine precision, the
    central-meridian invariants (E = 500000 exactly, N = k0 · meridian arc
    by numerical integration), and agreement with Snyder's classic TM
    series (a DIFFERENT published derivation) to its ~1 mm truncation."""

    def test_roundtrip_machine_precision(self):
        from geocube_spark.functions.crs import tm_forward, tm_inverse

        lon, lat = np.meshgrid(np.linspace(5.9, 12.1, 21), np.linspace(-79, 84, 23))
        e, n = tm_forward(lon, lat, 9.0)
        lon2, lat2 = tm_inverse(e, n, 9.0)
        np.testing.assert_allclose(lon2, lon, atol=1e-12)
        np.testing.assert_allclose(lat2, lat, atol=1e-12)

    def test_central_meridian_invariants(self):
        import math

        from geocube_spark.functions.crs import tm_forward

        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        for lat in (0.001, 27.3, 60.0, -45.0):
            E, N = tm_forward(9.0, lat, 9.0)
            assert float(E) == pytest.approx(500000.0, abs=1e-9)
            t = np.linspace(0, math.radians(lat), 400_001)
            arc = a * (1 - e2) * np.trapz((1 - e2 * np.sin(t) ** 2) ** -1.5, t)
            assert float(N) == pytest.approx(0.9996 * arc, abs=1e-4)

    def test_agrees_with_snyder_series(self):
        import math

        from geocube_spark.functions.crs import tm_forward

        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        ep2 = e2 / (1 - e2)
        k0 = 0.9996

        def snyder(lon, lat, lon0):
            phi, lam = math.radians(lat), math.radians(lon - lon0)
            nu = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
            T = math.tan(phi) ** 2
            C = ep2 * math.cos(phi) ** 2
            A = lam * math.cos(phi)
            M = a * (
                (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
                - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * math.sin(2 * phi)
                + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * math.sin(4 * phi)
                - (35 * e2**3 / 3072) * math.sin(6 * phi)
            )
            E = k0 * nu * (
                A + (1 - T + C) * A**3 / 6 + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120
            ) + 500000
            N = k0 * (
                M + nu * math.tan(phi) * (
                    A**2 / 2
                    + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
                    + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720
                )
            )
            return E, N

        for lo, la in [(9.5, 60), (7.2, 45.3), (11.9, -33.7), (6.1, 80), (10.5, -60)]:
            E1, N1 = tm_forward(lo, la, 9.0)
            E2, N2 = snyder(lo, la, 9.0)
            assert float(E1) == pytest.approx(E2, abs=5e-3)
            assert float(N1) == pytest.approx(N2, abs=5e-3)

    def test_south_zone_false_northing(self):
        from geocube_spark.functions.crs import tm_forward, utm_zone_params

        cm, n0 = utm_zone_params(32719)
        assert cm == -69.0 and n0 == 10000000.0
        E, N = tm_forward(-69.0, -33.0, cm, n0)
        En, Nn = tm_forward(-69.0, 33.0, cm, 0.0)
        # ellipsoid is symmetric: S northing = 1e7 - N northing
        assert float(N) == pytest.approx(1e7 - float(Nn), abs=1e-6)
        assert utm_zone_params(32601) == (-177.0, 0.0)
        assert utm_zone_params(4326) is None

    def test_composed_transforms(self):
        from geocube_spark.functions.crs import (
            tm_forward,
            transform_points,
        )

        # 3857 -> UTM composes through lon/lat
        x, y = transform_points(3857, 32632, np.array([1000000.0]), np.array([8500000.0]))
        lon, lat = transform_points(3857, 4326, np.array([1000000.0]), np.array([8500000.0]))
        E, N = tm_forward(lon, lat, 9.0)
        np.testing.assert_allclose(x, E, atol=1e-9)
        np.testing.assert_allclose(y, N, atol=1e-9)
        # zone -> zone roundtrips
        xs, ys = np.array([500000.0, 450000.0]), np.array([6650000.0, 6700000.0])
        xx, yy = transform_points(32632, 32633, xs, ys)
        bx, by = transform_points(32633, 32632, xx, yy)
        np.testing.assert_allclose(bx, xs, atol=1e-6)
        np.testing.assert_allclose(by, ys, atol=1e-6)

    def test_sql_twin_matches_numpy(self):
        import duckdb

        from geocube_spark.functions.crs import tm_forward, tm_forward_sql_columns

        cols = tm_forward_sql_columns("lon", "lat", 32632)
        con = duckdb.connect()
        q = (
            "WITH pts AS (SELECT lon.range*0.31 + 6.0 AS lon, "
            "lat.range*2.71 - 60.0 AS lat FROM range(0,20) lon, range(0,50) lat) "
            f"SELECT lon, lat, {cols} FROM pts"
        )
        rows = con.execute(q).fetchall()
        names = [d[0] for d in con.description]
        ie, iN = names.index("utm_e"), names.index("utm_n")
        lons = np.array([r[0] for r in rows])
        lats = np.array([r[1] for r in rows])
        E, N = tm_forward(lons, lats, 9.0)
        np.testing.assert_allclose(np.array([r[ie] for r in rows]), E, atol=1e-7)
        np.testing.assert_allclose(np.array([r[iN] for r in rows]), N, atol=1e-7)


class TestPolarStereographic:
    """Closed-form ellipsoidal polar stereographic (Snyder 21-33..21-41,
    crs.py) for EPSG:3031/3413/5041/5042.  Verified by projection-theory
    invariants rather than external vectors: machine-precision roundtrip,
    pole -> false origin, TRUE SCALE at the standard parallel (the defining
    property of a lat_ts variant, checked against the independent
    ellipsoidal parallel radius a·cosφ/√(1−e²sin²φ)), conformality (the
    metric-normalized Jacobian is a scaled rotation), axis orientation
    (east positive along λ0+90° in both aspects), and the SQL twin."""

    ALL = (3031, 3413, 5041, 5042)

    def _grid(self, srid):
        from geocube_spark.functions.crs import _PS_PARAMS

        south = _PS_PARAMS[srid][0]
        lons = np.linspace(-179.0, 179.0, 19)
        lats = np.linspace(-88.0, -60.0, 11) if south else np.linspace(60.0, 88.0, 11)
        lo, la = np.meshgrid(lons, lats)
        return lo.ravel(), la.ravel()

    @pytest.mark.parametrize("srid", ALL)
    def test_roundtrip_and_pole(self, srid):
        from geocube_spark.functions.crs import _PS_PARAMS, ps_forward, ps_inverse

        south, _, _, lon0, fe, fn = _PS_PARAMS[srid]
        lo, la = self._grid(srid)
        x, y = ps_forward(lo, la, srid)
        lo2, la2 = ps_inverse(x, y, srid)
        dlo = (lo2 - lo + 180.0) % 360.0 - 180.0
        np.testing.assert_allclose(dlo, 0.0, atol=1e-9)
        np.testing.assert_allclose(la2, la, atol=1e-9)
        px, py = ps_forward(lon0, -90.0 if south else 90.0, srid)
        assert float(px) == pytest.approx(fe, abs=1e-6)
        assert float(py) == pytest.approx(fn, abs=1e-6)

    @pytest.mark.parametrize("srid", (3031, 3413))
    def test_true_scale_at_standard_parallel(self, srid):
        from geocube_spark.functions.crs import _PS_PARAMS, ps_forward

        lat_ts = _PS_PARAMS[srid][1]
        d = 1e-6
        x1, y1 = ps_forward(10.0, lat_ts, srid)
        x2, y2 = ps_forward(10.0 + d, lat_ts, srid)
        proj_len = float(np.hypot(x2 - x1, y2 - y1))
        e2 = (1 / 298.257223563) * (2 - 1 / 298.257223563)
        m = np.cos(np.radians(lat_ts)) / np.sqrt(1 - e2 * np.sin(np.radians(lat_ts)) ** 2)
        true_len = 6378137.0 * m * np.radians(d)
        assert proj_len / true_len == pytest.approx(1.0, abs=1e-6)

    @pytest.mark.parametrize("srid", ALL)
    def test_conformality(self, srid):
        from geocube_spark.functions.crs import _PS_PARAMS, ps_forward

        south = _PS_PARAMS[srid][0]
        lo0, la0 = 30.0, (-75.0 if south else 75.0)
        d = 1e-6
        x0, y0 = (float(v) for v in ps_forward(lo0, la0, srid))
        xl, yl = (float(v) for v in ps_forward(lo0 + d, la0, srid))
        xp, yp = (float(v) for v in ps_forward(lo0, la0 + d, srid))
        e2 = (1 / 298.257223563) * (2 - 1 / 298.257223563)
        lr = np.radians(la0)
        M = 6378137.0 * (1 - e2) / (1 - e2 * np.sin(lr) ** 2) ** 1.5
        N = 6378137.0 / np.sqrt(1 - e2 * np.sin(lr) ** 2)
        a11 = (xl - x0) / (np.radians(d) * N * np.cos(lr))
        a21 = (yl - y0) / (np.radians(d) * N * np.cos(lr))
        a12 = (xp - x0) / (np.radians(d) * M)
        a22 = (yp - y0) / (np.radians(d) * M)
        assert a11 == pytest.approx(a22, abs=1e-4)  # scaled rotation =
        assert a12 == pytest.approx(-a21, abs=1e-4)  # conformal + sense-true

    def test_axis_orientation(self):
        from geocube_spark.functions.crs import ps_forward

        # EPSG:3031: east axis along 90E — (90E, -71) has x>0, y~0
        x, y = ps_forward(90.0, -71.0, 3031)
        assert float(x) > 2e6 and abs(float(y)) < 1e-6
        # along lon0 the northing is positive (toward the equator)
        x, y = ps_forward(0.0, -71.0, 3031)
        assert abs(float(x)) < 1e-6 and float(y) > 2e6
        # EPSG:3413 (lon0 -45): along lon0 northing is NEGATIVE (north aspect)
        x, y = ps_forward(-45.0, 70.0, 3413)
        assert abs(float(x)) < 1e-6 and float(y) < -2e6

    def test_ups_scale_at_pole(self):
        from geocube_spark.functions.crs import ps_forward

        # UPS: k0 = 0.994 at the pole; measure via a tiny meridian step
        d = 1e-5
        x1, y1 = ps_forward(0.0, 90.0, 5041)
        x2, y2 = ps_forward(0.0, 90.0 - d, 5041)
        proj_len = float(np.hypot(x2 - x1, y2 - y1))
        e2 = (1 / 298.257223563) * (2 - 1 / 298.257223563)
        M_pole = 6378137.0 * (1 - e2) / (1 - e2) ** 1.5  # meridian radius at pole
        assert proj_len / (M_pole * np.radians(d)) == pytest.approx(0.994, abs=1e-6)

    @pytest.mark.parametrize("srid", ALL)
    def test_sql_twin_matches_numpy(self, srid):
        import duckdb

        from geocube_spark.functions.crs import ps_forward, ps_forward_sql_columns

        lo, la = self._grid(srid)
        con = duckdb.connect()
        con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lo, la)))
        rows = con.execute(
            f"SELECT lon, lat, {ps_forward_sql_columns('lon', 'lat', srid)} FROM pts"
        ).fetchall()
        names = [d[0] for d in con.description]
        ie, iN = names.index("ps_e"), names.index("ps_n")
        E, Nn = ps_forward(np.array([r[0] for r in rows]), np.array([r[1] for r in rows]), srid)
        np.testing.assert_allclose(np.array([r[ie] for r in rows]), E, atol=1e-7)
        np.testing.assert_allclose(np.array([r[iN] for r in rows]), Nn, atol=1e-7)

    def test_composed_and_registry(self):
        from geocube_spark.functions.crs import transform_points

        # 3031 <-> 3413 composes through lon/lat and roundtrips
        xs = np.array([0.0, 1.5e6])
        ys = np.array([2.1e6, -1.0e6])
        ax, ay = transform_points(3031, 3413, xs, ys)
        bx, by = transform_points(3413, 3031, ax, ay)
        np.testing.assert_allclose(bx, xs, atol=1e-6)
        np.testing.assert_allclose(by, ys, atol=1e-6)



class TestLambertConformalConic:
    """Snyder 15-1..15-11 ellipsoidal LCC (EPSG:2154/3978 + CONUS 102004)."""

    @pytest.mark.parametrize("srid", [2154, 3978, 102004])
    def test_roundtrip_machine_precision(self, srid):
        from geocube_spark.functions.crs import (
            _LCC_PARAMS,
            lcc_forward,
            lcc_inverse,
        )

        _, _, lat0, lon0, _, _ = _LCC_PARAMS[srid]
        rng = np.random.default_rng(srid)
        lon = lon0 + rng.uniform(-8, 8, 200)
        lat = lat0 + rng.uniform(-8, 8, 200)
        e, n = lcc_forward(lon, lat, srid)
        lon2, lat2 = lcc_inverse(e, n, srid)
        np.testing.assert_allclose(lon2, lon, atol=1e-11)
        np.testing.assert_allclose(lat2, lat, atol=1e-11)

    @pytest.mark.parametrize("srid", [2154, 3978, 102004])
    def test_natural_origin_maps_to_false_origin(self, srid):
        from geocube_spark.functions.crs import _LCC_PARAMS, lcc_forward

        _, _, lat0, lon0, fe, fn = _LCC_PARAMS[srid]
        e, n = lcc_forward(np.array([lon0]), np.array([lat0]), srid)
        assert abs(e[0] - fe) < 1e-6 and abs(n[0] - fn) < 1e-6

    @pytest.mark.parametrize("srid", [2154, 3978, 102004])
    def test_unit_scale_at_standard_parallels(self, srid):
        """Definitional property of the secant cone: k = n·ρ/(a·m) is
        exactly 1 on both standard parallels, < 1 between them."""
        import math

        from geocube_spark.functions.crs import (
            _LCC_PARAMS,
            _TM_E,
            WGS84_A,
            _lcc_constants,
        )

        lat1, lat2, lat0, _, _, _ = _LCC_PARAMS[srid]
        n, aF, _, _, _, _ = _lcc_constants(srid)

        def k(lat_deg):
            p = math.radians(lat_deg)
            sp = math.sin(p)
            m = math.cos(p) / math.sqrt(1 - _TM_E**2 * sp * sp)
            t = math.tan(math.pi / 4 - p / 2) * (
                (1 + _TM_E * sp) / (1 - _TM_E * sp)
            ) ** (_TM_E / 2)
            return n * aF * t**n / (WGS84_A * m)

        assert k(lat1) == pytest.approx(1.0, abs=1e-12)
        assert k(lat2) == pytest.approx(1.0, abs=1e-12)
        assert k((lat1 + lat2) / 2) < 1.0

    def test_conformality(self):
        """Small circles map to circles: local scale is direction-free."""
        from geocube_spark.functions.crs import lcc_forward

        lon0, lat0, h = 3.0, 46.5, 1e-6
        e0, n0 = lcc_forward(np.array([lon0]), np.array([lat0]), 2154)
        import math

        de_lon, dn_lon = lcc_forward(
            np.array([lon0 + h]), np.array([lat0]), 2154
        )
        de_lat, dn_lat = lcc_forward(
            np.array([lon0]), np.array([lat0 + h]), 2154
        )
        sx = np.hypot(de_lon - e0, dn_lon - n0)[0] / (
            h * math.cos(math.radians(lat0))
        )
        sy = np.hypot(de_lat - e0, dn_lat - n0)[0] / h
        # meridian vs parallel scale ratio ~ 1 (ellipsoidal M/N correction
        # is ~0.7%, so compare loosely but directionally)
        assert sx / sy == pytest.approx(1.0, rel=2e-2)

    def test_sql_twin_matches_numpy(self):
        import duckdb

        from geocube_spark.functions.crs import lcc_forward, lcc_forward_sql_columns

        rng = np.random.default_rng(7)
        lo = 3.0 + rng.uniform(-5, 5, 64)
        la = 46.5 + rng.uniform(-5, 5, 64)
        con = duckdb.connect()
        con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lo, la)))
        rows = con.execute(
            f"SELECT lon, lat, {lcc_forward_sql_columns('lon', 'lat', 2154)} FROM pts"
        ).fetchall()
        names = [d[0] for d in con.description]
        ie, iN = names.index("lcc_e"), names.index("lcc_n")
        E, Nn = lcc_forward(
            np.array([r[0] for r in rows]), np.array([r[1] for r in rows]), 2154
        )
        np.testing.assert_allclose(np.array([r[ie] for r in rows]), E, atol=1e-7)
        np.testing.assert_allclose(np.array([r[iN] for r in rows]), Nn, atol=1e-7)

    def test_registry_composition(self):
        from geocube_spark.functions.crs import transform_points

        # Lambert-93 <-> UTM 31N composes through lon/lat and roundtrips
        xs = np.array([700000.0, 650000.0])
        ys = np.array([6600000.0, 6860000.0])
        ax, ay = transform_points(2154, 32631, xs, ys)
        bx, by = transform_points(32631, 2154, ax, ay)
        np.testing.assert_allclose(bx, xs, atol=1e-6)
        np.testing.assert_allclose(by, ys, atol=1e-6)



class TestAlbersEqualArea:
    """Snyder 14-1..14-21 ellipsoidal Albers (EPSG:5070/3577 + ESRI 102003)."""

    @pytest.mark.parametrize("srid", [5070, 3577, 102003])
    def test_roundtrip_machine_precision(self, srid):
        from geocube_spark.functions.crs import (
            _AEA_PARAMS,
            aea_forward,
            aea_inverse,
        )

        lat1, lat2, lat0, lon0, _, _ = _AEA_PARAMS[srid]
        rng = np.random.default_rng(srid)
        lon = lon0 + rng.uniform(-12, 12, 200)
        lat = (
            rng.uniform(-40, -12, 200)
            if srid == 3577
            else lat0 + rng.uniform(-10, 10, 200)
        )
        e, n = aea_forward(lon, lat, srid)
        lon2, lat2_ = aea_inverse(e, n, srid)
        np.testing.assert_allclose(lon2, lon, atol=1e-11)
        np.testing.assert_allclose(lat2_, lat, atol=1e-11)

    @pytest.mark.parametrize("srid", [5070, 3577, 102003])
    def test_natural_origin_maps_to_false_origin(self, srid):
        from geocube_spark.functions.crs import _AEA_PARAMS, aea_forward

        _, _, lat0, lon0, fe, fn = _AEA_PARAMS[srid]
        e, n = aea_forward(np.array([lon0]), np.array([lat0]), srid)
        assert abs(e[0] - fe) < 1e-6 and abs(n[0] - fn) < 1e-6

    def test_equal_area_property(self):
        """Definitional: a small geographic quad's projected area equals
        its ellipsoidal area (M·N·cosφ·dλ·dφ) to first order — the
        property conformal projections deliberately do NOT have."""
        import math

        from geocube_spark.functions.crs import WGS84_A, _TM_E, aea_forward

        for lat0 in (30.0, 37.5, 45.0):
            h = 0.01
            lon = np.array([-96.0, -96.0 + h, -96.0 + h, -96.0])
            lat = np.array([lat0, lat0, lat0 + h, lat0 + h])
            E, N = aea_forward(lon, lat, 5070)
            proj = 0.5 * abs(
                sum(
                    E[i] * N[(i + 1) % 4] - E[(i + 1) % 4] * N[i]
                    for i in range(4)
                )
            )
            e2 = _TM_E**2
            p = math.radians(lat0 + h / 2)
            sp = math.sin(p)
            W = math.sqrt(1 - e2 * sp * sp)
            M = WGS84_A * (1 - e2) / W**3
            Nr = WGS84_A / W
            true = M * Nr * math.cos(p) * math.radians(h) ** 2
            assert proj / true == pytest.approx(1.0, rel=1e-4)

    def test_sql_twin_matches_numpy(self):
        import duckdb

        from geocube_spark.functions.crs import aea_forward, aea_forward_sql_columns

        rng = np.random.default_rng(9)
        lo = -96.0 + rng.uniform(-8, 8, 64)
        la = 37.5 + rng.uniform(-8, 8, 64)
        con = duckdb.connect()
        con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lo, la)))
        rows = con.execute(
            f"SELECT lon, lat, {aea_forward_sql_columns('lon', 'lat', 5070)} FROM pts"
        ).fetchall()
        names = [d[0] for d in con.description]
        ie, iN = names.index("aea_e"), names.index("aea_n")
        E, Nn = aea_forward(
            np.array([r[0] for r in rows]), np.array([r[1] for r in rows]), 5070
        )
        np.testing.assert_allclose(np.array([r[ie] for r in rows]), E, atol=1e-7)
        np.testing.assert_allclose(np.array([r[iN] for r in rows]), Nn, atol=1e-7)

    def test_registry_composition(self):
        from geocube_spark.functions.crs import transform_points

        # CONUS Albers <-> CONUS LCC composes through lon/lat
        xs = np.array([0.0, 300000.0])
        ys = np.array([1606786.0, 2000000.0])
        ax, ay = transform_points(5070, 102004, xs, ys)
        bx, by = transform_points(102004, 5070, ax, ay)
        np.testing.assert_allclose(bx, xs, atol=1e-6)
        np.testing.assert_allclose(by, ys, atol=1e-6)


class TestURI:
    def test_gdal_uri_roundtrip(self):
        u = gdal_uri("file:///c.tif", "GTIFF_DIR:2")
        assert u == "GTIFF_DIR:2:file:///c.tif"
        base, sub = split_gdal_uri(u)
        assert (base, sub) == ("file:///c.tif", "GTIFF_DIR:2")
        assert split_gdal_uri("gs://bucket/x.tif") == ("gs://bucket/x.tif", "")

    def test_url_join(self):
        assert url_join("gs://b/", "layout", "cell/1", "x.tif") == "gs://b/layout/cell/1/x.tif"

    def test_urn(self):
        # urn.go:31-38: '/'-separated segments of [a-zA-Z0-9-:_];
        # dots are NOT in the charset (the pre-round-9 local regex
        # wrongly accepted them)
        validate_urn("S2A_MSIL1C:2018_tile-31")
        validate_urn("mission/pass/tile-31")
        with pytest.raises(ValueError):
            validate_urn("no spaces")
        with pytest.raises(ValueError):
            validate_urn("S2A.tile")

    def test_parse_storage_uri(self):
        # gcs/utils_test.go TestParse, vector-for-vector
        from geocube_spark.functions.uri import parse_storage_uri

        for u in ("gs://bucket/object.foo", "/bucket/object.foo", "bucket/object.foo"):
            assert parse_storage_uri(u) == ("bucket", "object.foo")
        for u in ("gs://bucket/path/to/object.foo", "/bucket/path/to/object.foo",
                  "bucket/path/to/object.foo"):
            assert parse_storage_uri(u) == ("bucket", "path/to/object.foo")
        for bad in ("bucket", "bucket/", "/bucket/", "gs://bucket",
                    "gs://bucket/", "//path/to/object", "gs:///path/to/object"):
            with pytest.raises(ValueError, match="badly formatted"):
                parse_storage_uri(bad)


class TestPNG:
    def _decode_ihdr(self, png: bytes):
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        length, tag = struct.unpack(">I4s", png[8:16])
        assert tag == b"IHDR"
        w, h, depth, ctype = struct.unpack(">IIBB", png[16:26])
        return w, h, depth, ctype

    def _idat_pixels(self, png: bytes, channels: int, w: int, h: int):
        off = 8
        data = b""
        while off < len(png):
            (length,) = struct.unpack(">I", png[off : off + 4])
            tag = png[off + 4 : off + 8]
            if tag == b"IDAT":
                data += png[off + 8 : off + 8 + length]
            off += 12 + length
        raw = zlib.decompress(data)
        stride = 1 + w * channels
        rows = [raw[i * stride + 1 : (i + 1) * stride] for i in range(h)]
        return np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w, channels)

    def test_grayscale_roundtrip(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        png = encode_png(img)
        w, h, depth, ctype = self._decode_ihdr(png)
        assert (w, h, depth, ctype) == (8, 8, 8, 0)
        back = self._idat_pixels(png, 1, 8, 8)[:, :, 0]
        np.testing.assert_array_equal(back, img)

    def test_slice_to_png_gray_and_palette(self):
        dm = {
            "dtype": "Int16", "no_data": -32768.0, "min_value": 0.0, "max_value": 100.0,
            "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0,
        }
        px = [0.0, 50.0, 100.0, -32768.0]
        png = slice_to_png(px, 2, 2, dm)
        w, h, depth, ctype = self._decode_ihdr(png)
        assert (w, h, ctype) == (2, 2, 0)
        gray = self._idat_pixels(png, 1, 2, 2)[:, :, 0].ravel()
        assert list(gray) == [0, 128, 255, 0]  # nodata -> 0

        from geocube_spark.functions.palette import ColorPoint

        pts = [ColorPoint(0.0, 0, 0, 255, 255), ColorPoint(1.0, 255, 0, 0, 255)]
        png2 = slice_to_png(px, 2, 2, dm, pts)
        _, _, _, ctype2 = self._decode_ihdr(png2)
        assert ctype2 == 6  # RGBA
        rgba = self._idat_pixels(png2, 4, 2, 2).reshape(4, 4)
        assert tuple(rgba[0]) == (0, 0, 255, 255)  # value 0 -> blue
        assert tuple(rgba[2]) == (255, 0, 0, 255)  # value 1 -> red
        assert tuple(rgba[3]) == (0, 0, 0, 0)  # nodata -> transparent

    def test_rejects_non_uint8(self):
        with pytest.raises(ValueError):
            encode_png(np.zeros((2, 2), dtype=np.float64))


class TestTagOps:
    def test_add_overwrite_remove(self, spark, fixture_dir):
        records = spark.read.parquet(f"{fixture_dir}/records.parquet")
        ids = [r["id"] for r in records.limit(3).collect()]
        out = update_record_tags(
            records, ids, add={"PROC": "L2B", "NEWKEY": "x"}, remove=["ORBIT"]
        )
        changed = {r["id"]: r["tags"] for r in out.filter(F.col("id").isin(ids)).collect()}
        for t in changed.values():
            assert t["PROC"] == "L2B" and t["NEWKEY"] == "x"
            assert "ORBIT" not in t
        # untouched rows keep their tags
        before = {r["id"]: r["tags"] for r in records.collect()}
        after = {r["id"]: r["tags"] for r in out.collect()}
        for rid in set(before) - set(ids):
            assert before[rid] == after[rid]


class TestExtendedKernels:
    @pytest.mark.parametrize(
        "alg,expect",
        [
            ("MED", 2.5), ("Q1", 1.0), ("Q3", 3.0), ("MIN", 1.0),
            ("MAX", 4.0), ("AVERAGE", 2.5), ("MODE", 1.0),
        ],
    )
    def test_window_kernels(self, spark, alg, expect):
        """One 2×2 source block [1,2;3,4]: output pixel (0,0) pools all four
        (MODE: all unique -> ties broken toward the smallest)."""
        from geocube_spark.operators.pyramid import build_level

        df = spark.createDataFrame(
            [
                ("c", 1, 0, 0, 0, [1.0, 2.0, 3.0, 4.0], 0,
                 {"a": 1.0, "b": 0.0, "c": 0.0, "d": 0.0, "e": -1.0, "f": 0.0}),
            ],
            "container_uri STRING, band INT, level INT, block_x INT, block_y INT,"
            " px ARRAY<DOUBLE>, crs_srid INT,"
            " pix_to_crs STRUCT<a:DOUBLE,b:DOUBLE,c:DOUBLE,d:DOUBLE,e:DOUBLE,f:DOUBLE>",
        )
        out = build_level(df, level=1, block_w=2, block_h=2, alg=alg, nodata=-1.0).collect()
        assert len(out) == 1
        px = out[0]["px"]
        assert px[0] == pytest.approx(expect)
        # the other 3 output pixels pool missing quadrants -> nodata
        assert px[1:] == [-1.0, -1.0, -1.0]


class TestSphericalWorldProjections:
    """Sinusoidal (MODIS SR-ORG:6974), Mollweide (ESRI:53009) and Plate
    Carree (EPSG:32662) — the spherical world-grid family (Snyder eqs
    30-1/30-2, 31-1..31-8; EPSG method 9823).  Reference accepts these via
    PROJ (internal/utils/proj/proj.go:47-73)."""

    LON = np.array([-170.0, -10.0, 0.0, 10.0, 95.5, 179.0])
    LAT = np.array([-80.0, -45.0, 0.0, 30.0, 45.0, 72.0])

    @pytest.mark.parametrize("srid", [6974, 53008])
    def test_sinusoidal_roundtrip(self, srid):
        from geocube_spark.functions.crs import sinu_forward, sinu_inverse

        x, y = sinu_forward(self.LON, self.LAT, srid)
        lo, la = sinu_inverse(x, y, srid)
        np.testing.assert_allclose(lo, self.LON, atol=1e-9)
        np.testing.assert_allclose(la, self.LAT, atol=1e-9)

    def test_modis_grid_half_width(self):
        # the published MODIS sinusoidal grid extent: x(180, 0) = R*pi
        from geocube_spark.functions.crs import sinu_forward

        x, y = sinu_forward(np.array([180.0]), np.array([0.0]), 6974)
        assert abs(x[0] - 20015109.3558) < 1e-3
        assert y[0] == 0.0

    def test_sinusoidal_equal_area_property(self):
        # pseudocylindrical equal-area: d(x)/d(lon) proportional to cos(lat)
        from geocube_spark.functions.crs import sinu_forward

        x1, _ = sinu_forward(np.array([10.0]), np.array([60.0]), 6974)
        x0, _ = sinu_forward(np.array([10.0]), np.array([0.0]), 6974)
        np.testing.assert_allclose(x1[0] / x0[0], np.cos(np.radians(60.0)),
                                   rtol=1e-12)

    def test_mollweide_roundtrip(self):
        from geocube_spark.functions.crs import moll_forward, moll_inverse

        x, y = moll_forward(self.LON, self.LAT, 53009)
        lo, la = moll_inverse(x, y, 53009)
        np.testing.assert_allclose(lo, self.LON, atol=1e-9)
        np.testing.assert_allclose(la, self.LAT, atol=1e-9)

    def test_mollweide_frame(self):
        # equator half-width is 2*sqrt(2)*R/pi * pi = 2 sqrt 2 R / ... :
        # x(180, 0) = 2*sqrt(2)*R*pi/(pi) /2 ... assert the two classic
        # frame constants directly: x(180,0) = 2*sqrt(2)*R, y(0,90) = sqrt(2)*R
        from geocube_spark.functions.crs import moll_forward

        R = 6371000.0
        x, _ = moll_forward(np.array([180.0]), np.array([0.0]), 53009)
        np.testing.assert_allclose(x[0], 2.0 * np.sqrt(2.0) * R, rtol=1e-12)
        _, y = moll_forward(np.array([0.0]), np.array([90.0]), 53009)
        np.testing.assert_allclose(y[0], np.sqrt(2.0) * R, rtol=1e-9)

    def test_plate_carree_roundtrip_and_scale(self):
        from geocube_spark.functions.crs import eqc_forward, eqc_inverse

        x, y = eqc_forward(self.LON, self.LAT, 32662)
        # linear in both axes: x(180,0) = R*pi
        np.testing.assert_allclose(
            eqc_forward(np.array([180.0]), np.array([0.0]), 32662)[0][0],
            6378137.0 * np.pi, rtol=1e-15)
        lo, la = eqc_inverse(x, y, 32662)
        np.testing.assert_allclose(lo, self.LON, atol=1e-12)
        np.testing.assert_allclose(la, self.LAT, atol=1e-12)

    def test_parse_proj4_signatures(self):
        assert parse_crs("+proj=sinu +R=6371007.181 +nadgrids=@null") == 6974
        assert parse_crs("+proj=sinu") == 53008
        assert parse_crs("+proj=moll +lon_0=0") == 53009
        assert parse_crs("+proj=eqc +lat_ts=0") == 32662

    def test_hub_composition(self):
        # 3857 -> MODIS sinusoidal goes through the lon/lat hub
        from geocube_spark.functions.crs import resolve_transform

        fn = resolve_transform(3857, 6974)
        back = resolve_transform(6974, 3857)
        x, y = fn(np.array([1113194.9]), np.array([5621521.5]))
        mx, my = back(x, y)
        np.testing.assert_allclose(mx[0], 1113194.9, atol=1e-6)
        np.testing.assert_allclose(my[0], 5621521.5, atol=1e-6)

    def test_sql_twin_matches_numpy(self):
        import duckdb

        from geocube_spark.functions.crs import (
            sinu_forward,
            sinu_forward_sql_columns,
        )

        frag = sinu_forward_sql_columns("lon", "lat", 6974)
        rel = duckdb.sql(
            f"SELECT {frag} FROM (SELECT 10.0 + range * 7.3 AS lon, "
            "-60.0 + range * 13.1 AS lat FROM range(0, 9))"
        ).fetchall()
        lon = np.array([10.0 + i * 7.3 for i in range(9)])
        lat = np.array([-60.0 + i * 13.1 for i in range(9)])
        x, y = sinu_forward(lon, lat, 6974)
        got = np.array(rel)[:, -2:]
        np.testing.assert_allclose(got[:, 0], x, rtol=1e-12)
        np.testing.assert_allclose(got[:, 1], y, rtol=1e-12)


class TestNationalTMGrids:
    """Generalized Krüger TM (arbitrary ellipsoid / lat0 / k0 / FE / FN)
    + 7-param Helmert datum shifts: EPSG:27700 (OSGB36, Airy 1830) and
    EPSG:2193 (NZTM2000, GRS80).  Validated against the Ordnance Survey's
    published worked example ("A guide to coordinate systems in Great
    Britain", annexe C)."""

    def test_os_worked_example(self):
        # OSGB36 phi 52°39'27.2531"N, lam 1°43'4.5177"E -> E 651409.903,
        # N 313177.270 (TM on Airy, no datum shift involved)
        from geocube_spark.functions.crs import tmgrid_forward

        phi = 52 + 39 / 60 + 27.2531 / 3600
        lam = 1 + 43 / 60 + 4.5177 / 3600
        E, N = tmgrid_forward(np.array([lam]), np.array([phi]), 27700)
        assert abs(E[0] - 651409.903) < 1e-3
        assert abs(N[0] - 313177.270) < 1e-3

    def test_bng_grid_roundtrip(self):
        from geocube_spark.functions.crs import tmgrid_forward, tmgrid_inverse

        lon = np.array([-5.5, -2.0, 0.0, 1.7])
        lat = np.array([50.0, 52.0, 54.5, 58.0])
        E, N = tmgrid_forward(lon, lat, 27700)
        lo, la = tmgrid_inverse(E, N, 27700)
        np.testing.assert_allclose(lo, lon, atol=1e-11)
        np.testing.assert_allclose(la, lat, atol=1e-11)

    def test_nztm_origin_and_roundtrip(self):
        from geocube_spark.functions.crs import tmgrid_forward, tmgrid_inverse

        E, N = tmgrid_forward(np.array([173.0]), np.array([0.0]), 2193)
        assert E[0] == 1600000.0 and N[0] == 10000000.0
        lon = np.array([166.5, 173.0, 178.2])
        lat = np.array([-47.3, -41.0, -34.5])
        E, N = tmgrid_forward(lon, lat, 2193)
        lo, la = tmgrid_inverse(E, N, 2193)
        np.testing.assert_allclose(lo, lon, atol=1e-11)
        np.testing.assert_allclose(la, lat, atol=1e-11)

    def test_helmert_exact_inverse(self):
        from geocube_spark.functions.crs import (
            _helmert_from_wgs84,
            _helmert_to_wgs84,
            _TM_GRIDS,
        )

        params = _TM_GRIDS[27700][6]
        X = np.array([3874938.849, 0.0, -2394587.3])
        Y = np.array([116218.624, 6378137.0, 5417031.2])
        Z = np.array([5047168.208, 0.0, -2416406.1])
        Xw, Yw, Zw = _helmert_to_wgs84(X, Y, Z, params)
        Xb, Yb, Zb = _helmert_from_wgs84(Xw, Yw, Zw, params)
        np.testing.assert_allclose(Xb, X, atol=1e-8)
        np.testing.assert_allclose(Yb, Y, atol=1e-8)
        np.testing.assert_allclose(Zb, Z, atol=1e-8)

    def test_wgs84_chain_roundtrip(self):
        from geocube_spark.functions.crs import tmgrid_from_wgs84, tmgrid_to_wgs84

        lon = np.array([-5.7, -2.0, 0.1, 1.8])
        lat = np.array([50.1, 53.0, 51.5, 57.3])
        E, N = tmgrid_from_wgs84(lon, lat, 27700)
        lo, la = tmgrid_to_wgs84(E, N, 27700)
        # Bowring + 1 refinement: ~2e-8 deg (2 mm) round trip
        np.testing.assert_allclose(lo, lon, atol=1e-7)
        np.testing.assert_allclose(la, lat, atol=1e-7)

    def test_bowring_matches_converged_iteration(self):
        from geocube_spark.functions.crs import (
            _ecef_to_geodetic,
            _geodetic_to_ecef,
        )

        lon = np.array([-5.0, 0.0, 3.0, 179.0])
        lat = np.array([-80.0, 0.0, 52.0, 85.0])
        X, Y, Z = _geodetic_to_ecef(lon, lat, "airy")
        lo, la = _ecef_to_geodetic(X, Y, Z, "airy")
        np.testing.assert_allclose(lo, lon, atol=1e-12)
        np.testing.assert_allclose(la, lat, atol=1e-9)

    def test_hub_composition_bng_utm(self):
        # 27700 -> UTM 30N composes through the WGS84 hub
        from geocube_spark.functions.crs import resolve_transform

        fwd = resolve_transform(27700, 32630)
        back = resolve_transform(32630, 27700)
        E, N = fwd(np.array([530000.0]), np.array([180000.0]))
        Eb, Nb = back(E, N)
        np.testing.assert_allclose(Eb[0], 530000.0, atol=1e-2)
        np.testing.assert_allclose(Nb[0], 180000.0, atol=1e-2)

    def test_sql_cte_twin_matches_numpy(self):
        import duckdb

        from geocube_spark.functions.crs import (
            tmgrid_from_wgs84,
            tmgrid_from_wgs84_sql_ctes,
        )

        lons = [-6.0 + i * 0.93 for i in range(9)]
        lats = [50.0 + i * 0.81 for i in range(9)]
        vals = ", ".join(
            f"({i}, {lo}, {la})" for i, (lo, la) in enumerate(zip(lons, lats))
        )
        ctes = tmgrid_from_wgs84_sql_ctes(27700, "lon", "lat", "pts", carry=("i",))
        rows = duckdb.sql(
            f"WITH pts AS (SELECT * FROM (VALUES {vals}) t(i, lon, lat)),"
            f"{ctes} SELECT * FROM tmg_out ORDER BY i"
        ).df()
        E, N = tmgrid_from_wgs84(np.array(lons), np.array(lats), 27700)
        np.testing.assert_allclose(rows["tmg_e"].values, E, atol=1e-6)
        np.testing.assert_allclose(rows["tmg_n"].values, N, atol=1e-6)


class TestProj4FamilyMatching:
    """parse_crs resolves +proj=lcc/aea/tmerc specs by matching numeric
    parameters against the registered grid tables (no guessing: an
    unregistered parameter set raises)."""

    def test_lambert93(self):
        assert parse_crs(
            "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
            "+x_0=700000 +y_0=6600000 +ellps=GRS80 +units=m"
        ) == 2154

    def test_conus_albers(self):
        assert parse_crs(
            "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
            "+x_0=0 +y_0=0 +datum=NAD83"
        ) == 5070

    def test_british_national_grid(self):
        assert parse_crs(
            "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
            "+x_0=400000 +y_0=-100000 +ellps=airy"
        ) == 27700

    def test_nztm(self):
        assert parse_crs(
            "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 "
            "+x_0=1600000 +y_0=10000000 +ellps=GRS80"
        ) == 2193

    def test_polar_stereographic_signatures(self):
        assert parse_crs(
            "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 "
            "+ellps=WGS84"
        ) == 3031
        assert parse_crs(
            "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0"
        ) == 3413
        assert parse_crs(
            "+proj=stere +lat_0=90 +k=0.994 +lon_0=0 +x_0=2000000 "
            "+y_0=2000000"
        ) == 5041

    def test_oblique_stereographic_raises(self):
        # oblique stereographic (e.g. Dutch RD) is outside the polar family
        with pytest.raises(CRSError):
            parse_crs("+proj=stere +lat_0=52.15 +lon_0=5.38 +k=0.9999")

    def test_unregistered_conic_constructs(self):
        # an unregistered WGS84-family parameter set is CONSTRUCTED into a
        # synthetic SRID (the reference accepts any parameters via PROJ)
        srid = parse_crs("+proj=lcc +lat_1=10 +lat_2=20 +lat_0=15 +lon_0=0")
        assert srid >= 900900
        # identical spec -> identical SRID (interned, not re-allocated)
        assert parse_crs(
            "+proj=lcc +lat_1=10 +lat_2=20 +lat_0=15 +lon_0=0"
        ) == srid

    def test_unregistered_tmerc_constructs(self):
        srid = parse_crs(
            "+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0"
        )
        assert srid >= 900900
        lon, lat = np.array([9.7]), np.array([48.3])
        x, y = transform_points(4326, srid, lon, lat)
        lon2, lat2 = transform_points(srid, 4326, x, y)
        assert abs(lon2[0] - 9.7) < 1e-9 and abs(lat2[0] - 48.3) < 1e-9

    def test_non_wgs84_ellipsoid_raises(self):
        with pytest.raises(CRSError):
            parse_crs(
                "+proj=lcc +lat_1=10 +lat_2=20 +lat_0=15 +lon_0=0 "
                "+ellps=bessel"
            )


class TestParameterDrivenCRS:
    """crs_from_parameters / proj4 / WKT construction (C6: the reference
    accepts ANY projected CRS parameter set via PROJ — proj.go:47-73)."""

    LAEA_3035 = (
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
        "+ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs"
    )

    def test_proj4_laea_dedupes_to_epsg(self):
        assert parse_crs(self.LAEA_3035) == 3035

    def test_laea_epsg_guidance_note_example(self):
        # EPSG Guidance Note 7-2 worked example (ETRS89 / LAEA Europe):
        # lat 50°N lon 5°E -> E 3962799.45, N 2999718.85
        x, y = laea_forward(np.array([5.0]), np.array([50.0]), 3035)
        assert abs(x[0] - 3962799.45) < 0.01
        assert abs(y[0] - 2999718.85) < 0.01
        lon, lat = laea_inverse(x, y, 3035)
        assert abs(lon[0] - 5.0) < 1e-9 and abs(lat[0] - 50.0) < 1e-9

    def test_laea_roundtrip_grid(self):
        lons = np.linspace(-10.0, 30.0, 21)
        lats = np.linspace(35.0, 70.0, 15)
        lo, la = np.meshgrid(lons, lats)
        x, y = transform_points(4326, 3035, lo.ravel(), la.ravel())
        lo2, la2 = transform_points(3035, 4326, x, y)
        assert np.abs(lo2 - lo.ravel()).max() < 1e-9
        assert np.abs(la2 - la.ravel()).max() < 1e-9

    def test_custom_laea_synthetic(self):
        srid = parse_crs("+proj=laea +lat_0=-20 +lon_0=135")  # custom
        assert srid >= 900900
        x, y = transform_points(4326, srid, np.array([137.0]), np.array([-22.0]))
        lon, lat = transform_points(srid, 4326, x, y)
        assert abs(lon[0] - 137.0) < 1e-9 and abs(lat[0] + 22.0) < 1e-9
        # projection center maps to the (0, 0) false origin
        x0, y0 = transform_points(
            4326, srid, np.array([135.0]), np.array([-20.0])
        )
        assert abs(x0[0]) < 1e-6 and abs(y0[0]) < 1e-6

    def test_wkt1_parameters_construct(self):
        wkt = (
            'PROJCS["Custom LAEA Europe",GEOGCS["ETRS89",DATUM["European_'
            'Terrestrial_Reference_System_1989",SPHEROID["GRS 1980",6378137,'
            '298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",'
            '0.0174532925199433]],PROJECTION["Lambert_Azimuthal_Equal_Area"],'
            'PARAMETER["latitude_of_center",52],PARAMETER["longitude_of_center"'
            ',10],PARAMETER["false_easting",4321000],'
            'PARAMETER["false_northing",3210000],UNIT["metre",1]]'
        )
        # same parameters as EPSG:3035 -> dedupes onto the registered code
        assert parse_crs(wkt) == 3035

    def test_wkt2_method_parameters_construct(self):
        wkt2 = (
            'PROJCRS["custom lcc",BASEGEOGCRS["WGS 84",DATUM["World Geodetic '
            'System 1984",ELLIPSOID["WGS 84",6378137,298.257223563]]],'
            'CONVERSION["conic",METHOD["Lambert Conic Conformal (2SP)"],'
            'PARAMETER["Latitude of false origin",63],'
            'PARAMETER["Longitude of false origin",15],'
            'PARAMETER["Latitude of 1st standard parallel",60],'
            'PARAMETER["Latitude of 2nd standard parallel",66],'
            'PARAMETER["Easting at false origin",500000],'
            'PARAMETER["Northing at false origin",0]]]'
        )
        srid = parse_crs(wkt2)
        assert srid >= 900900
        # equivalent proj4 spec resolves to the SAME synthetic SRID
        assert parse_crs(
            "+proj=lcc +lat_1=60 +lat_2=66 +lat_0=63 +lon_0=15 "
            "+x_0=500000 +y_0=0 +datum=WGS84"
        ) == srid
        x, y = transform_points(4326, srid, np.array([15.0]), np.array([63.0]))
        assert abs(x[0] - 500000.0) < 1e-6 and abs(y[0]) < 1e-6

    def test_wkt_non_wgs84_datum_raises(self):
        wkt = (
            'PROJCS["bessel grid",GEOGCS["DHDN",DATUM["Deutsches_Haupt'
            'dreiecksnetz",SPHEROID["Bessel 1841",6377397.155,299.1528128]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Transverse_Mercator"],'
            'PARAMETER["central_meridian",9],UNIT["metre",1]]'
        )
        with pytest.raises(CRSError):
            parse_crs(wkt)

    def test_wkt_datum_gate_keyed_on_clause_not_whole_string(self):
        # PROJCS NAME contains 'ETRS89' but the base datum is Bessel 1841 —
        # must raise, not silently construct on the WGS84 ellipsoid
        wkt = (
            'PROJCS["ETRS89-lookalike zone",GEOGCS["DHDN",DATUM["Deutsches_'
            'Hauptdreiecksnetz",SPHEROID["Bessel 1841",6377397.155,'
            '299.1528128]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Transverse_Mercator"],'
            'PARAMETER["central_meridian",9],UNIT["metre",1]]'
        )
        with pytest.raises(CRSError):
            parse_crs(wkt)

    def test_wkt1_polar_stereographic_variant_b_gdal_spelling(self):
        # GDAL's common WKT1 spelling carries the standard parallel as
        # latitude_of_origin = -71: lat_ts=-71, pole inferred south
        wkt = (
            'PROJCS["custom antarctic ps",GEOGCS["WGS 84",DATUM["WGS_1984",'
            'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Polar_Stereographic"],'
            'PARAMETER["latitude_of_origin",-71],'
            'PARAMETER["central_meridian",0],'
            'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
            'UNIT["metre",1]]'
        )
        assert parse_crs(wkt) == 3031  # dedupes onto Antarctic PS

    def test_wkt_unsupported_method_raises(self):
        wkt = (
            'PROJCS["oblique",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID'
            '["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Hotine_Oblique_Mercator"],'
            'PARAMETER["central_meridian",115],UNIT["metre",1]]'
        )
        with pytest.raises(CRSError):
            parse_crs(wkt)

    def test_from_parameters_polar_stereo(self):
        srid = crs_from_parameters(
            "stere", lat_0=90.0, lat_ts=70.0, lon_0=-45.0
        )
        assert srid == 3413  # dedupes onto the registered EPSG code
        with pytest.raises(CRSError):
            crs_from_parameters("stere", lat_0=52.15)  # oblique

    def test_laea_equal_area_property(self):
        # equal-area: a 1°x1° cell at 40°N and one at 60°N keep their true
        # ellipsoidal area ratio through the projection (shoelace on a
        # densified boundary), conformal projections would not
        def cell_area(lat0):
            t = np.linspace(0.0, 1.0, 200)
            lon_e = np.concatenate([10 + t, np.full(200, 11.0), 11 - t,
                                    np.full(200, 10.0)])
            lat_e = np.concatenate([np.full(200, lat0), lat0 + t,
                                    np.full(200, lat0 + 1.0), lat0 + 1 - t])
            x, y = transform_points(4326, 3035, lon_e, lat_e)
            return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))

        # authalic-sphere truth: area ∝ sin(beta_top) - sin(beta_bottom)
        from geocube_spark.functions.crs import _aea_q_scalar

        def true_ratio(l1, l2):
            import math

            def band(l0):
                return _aea_q_scalar(math.radians(l0 + 1.0)) - _aea_q_scalar(
                    math.radians(l0)
                )

            return band(l1) / band(l2)

        got = cell_area(40.0) / cell_area(60.0)
        assert abs(got - true_ratio(40.0, 60.0)) < 1e-6


class TestGridShiftTransforms:
    """NTv2-style correction lattices (proj.go:47-73 parity surface)."""

    def _grid(self):
        import numpy as np

        from geocube_spark.functions.crs import ShiftGrid

        r, c = np.mgrid[0:16, 0:16]
        return ShiftGrid(
            lon0=-0.5, lat0=47.5, step=0.25,
            dlon_sec=(7 * c + 2 * r) % 9 - 4,
            dlat_sec=(3 * c + 5 * r) % 11 - 5,
        )

    def test_node_values_exact(self):
        import numpy as np

        g = self._grid()
        # at a lattice node the bilinear collapses to the node value
        lon = np.array([-0.5 + 3 * 0.25])  # c=3
        lat = np.array([47.5 + 2 * 0.25])  # r=2
        dlon, dlat = g.shift_degrees(lon, lat)
        assert dlon[0] * 3600 == (7 * 3 + 2 * 2) % 9 - 4
        assert dlat[0] * 3600 == (3 * 3 + 5 * 2) % 11 - 5

    def test_off_grid_zero_shift(self):
        import numpy as np

        g = self._grid()
        dlon, dlat = g.shift_degrees(np.array([100.0]), np.array([0.0]))
        assert dlon[0] == 0.0 and dlat[0] == 0.0

    def test_registered_roundtrip(self):
        import numpy as np

        from geocube_spark.functions.crs import (
            register_gridshift_transform,
            transform_points,
        )

        register_gridshift_transform(904801, 4326, self._grid())
        lon = np.linspace(0.05, 1.95, 23)
        lat = np.linspace(48.1, 49.9, 23)
        bx, by = transform_points(904801, 4326, lon, lat)
        # shifts applied and bounded by the 5-arcsec lattice amplitude
        assert np.all(np.abs(bx - lon) <= 5.0 / 3600 + 1e-12)
        assert np.any(bx != lon)
        # inverse (fixed-point) recovers the shifted-datum coords
        ix, iy = transform_points(4326, 904801, bx, by)
        # ~1e-9 deg = 0.1 mm — far inside any correction grid's own
        # accuracy; the fixed-point contraction rate is the shift gradient
        assert np.max(np.abs(ix - lon)) < 1e-9
        assert np.max(np.abs(iy - lat)) < 1e-9


class TestPyprojAdapter:
    """The optional-import pyproj bridge (crs._pyproj_transform): when
    pyproj is importable, any EPSG pair with no closed-form kernel
    resolves through it on demand; absent, CRSError stands."""

    @pytest.fixture()
    def fake_pyproj(self):
        """A minimal pyproj stand-in: EPSG:99901 is a pure shift of
        lon/lat (x+1000, y+2000), so expected outputs are analytic."""
        import sys
        import types

        import numpy as _np

        from geocube_spark.functions import crs as crs_mod

        class _FakeTransformer:
            def __init__(self, s, d):
                self.sign = 1 if d == "EPSG:4326" else -1
                if "99901" not in (s + d):
                    raise ValueError(f"unknown CRS pair {s} {d}")

            @classmethod
            def from_crs(cls, s, d, always_xy=False):
                assert always_xy
                return cls(s, d)

            def transform(self, xs, ys):
                xs = _np.asarray(xs, dtype=float)
                ys = _np.asarray(ys, dtype=float)
                return xs + 1000.0 * self.sign, ys + 2000.0 * self.sign

        mod = types.ModuleType("pyproj")
        mod.Transformer = _FakeTransformer
        sys.modules["pyproj"] = mod
        try:
            yield mod
        finally:
            del sys.modules["pyproj"]
            crs_mod._REGISTRY.pop((99901, 4326), None)
            crs_mod._REGISTRY.pop((4326, 99901), None)

    def test_unknown_pair_raises_without_pyproj(self):
        from geocube_spark.functions.crs import CRSError, resolve_transform

        with pytest.raises(CRSError, match="no transform registered"):
            resolve_transform(99901, 4326)

    def test_adapter_resolves_and_caches(self, fake_pyproj):
        import numpy as np

        from geocube_spark.functions import crs as crs_mod
        from geocube_spark.functions.crs import transform_points

        xs, ys = transform_points(99901, 4326, np.array([1.0]), np.array([2.0]))
        assert xs[0] == 1001.0 and ys[0] == 2002.0
        # registered like any plugin: second resolution is a cache hit
        assert (99901, 4326) in crs_mod._REGISTRY

    def test_warp_path_uses_adapter(self, fake_pyproj):
        """The cover/warp entry point (warped_extent -> transform_points)
        picks the adapter up with no further wiring."""
        from geocube_spark.functions.crs import warped_extent

        ext = warped_extent(99901, 4326, 0.0, 0.0, 1.0, 1.0)
        assert ext == (1000.0, 2000.0, 1001.0, 2001.0)

    def test_unknown_to_pyproj_too_raises(self, fake_pyproj):
        from geocube_spark.functions.crs import CRSError, resolve_transform

        with pytest.raises(CRSError, match="pyproj cannot transform"):
            resolve_transform(88888, 77777)
