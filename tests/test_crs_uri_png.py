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
        with pytest.raises(CRSError):
            parse_crs("+proj=utm +zone=31")

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
        with pytest.raises(CRSError):
            transform_points(4326, 32631, np.array([0.0]), np.array([0.0]))

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
        validate_urn("S2A_MSIL1C:2018.tile-31")
        with pytest.raises(ValueError):
            validate_urn("no spaces")


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
