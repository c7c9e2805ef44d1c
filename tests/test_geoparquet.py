"""GeoParquet footer-metadata interop."""

from __future__ import annotations

import pytest

from geocube_spark.functions.geometry import decode_wkb_polygons, rect_wkb
from geocube_spark.sources.geoparquet import read_geoparquet, write_geoparquet


def _vector_df(spark):
    rows = [
        (1, "alpha", bytearray(rect_wkb(0.0, 0.0, 2.0, 1.0))),
        (2, "beta", bytearray(rect_wkb(5.0, 5.0, 6.0, 6.0))),
    ]
    return spark.createDataFrame(rows, "id int, name string, geom binary")


def test_roundtrip_with_geo_metadata(spark, tmp_path):
    p = str(tmp_path / "aoi.parquet")
    geo = write_geoparquet(_vector_df(spark), p, {"geom": 4326})
    assert geo["primary_column"] == "geom"
    df, meta = read_geoparquet(spark, p)
    assert meta["columns"]["geom"]["encoding"] == "WKB"
    assert meta["columns"]["geom"]["crs"]["properties"]["name"] == "EPSG:4326"
    got = {r["id"]: bytes(r["geom"]) for r in df.collect()}
    ring = decode_wkb_polygons(got[2])[0][0]
    assert ring.min() == 5.0 and ring.max() == 6.0


def test_plain_parquet_rejected(spark, tmp_path):
    p = str(tmp_path / "plain")
    _vector_df(spark).write.parquet(p)
    with pytest.raises(ValueError, match="geo"):
        read_geoparquet(spark, p)
    # but reading a spark-written DIR that got stamped per-file works via
    # the first part file only when metadata exists — covered above


def test_row_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="dim-table"):
        write_geoparquet(
            _vector_df(spark), str(tmp_path / "x.parquet"), {"geom": 4326},
            max_rows=1,
        )


def test_requires_geometry_columns(spark, tmp_path):
    with pytest.raises(ValueError, match="geometry_columns"):
        write_geoparquet(_vector_df(spark), str(tmp_path / "y.parquet"), {})
