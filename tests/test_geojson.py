"""GeoJSON codec + cell export (abstractgrid.go CellsToJSON parity)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from geocube_spark.functions.geojson import (
    cells_to_geojson,
    geojson_to_wkb,
    wkb_to_geojson,
)
from geocube_spark.functions.geometry import decode_wkb_polygons, wkb_bounds


POLY = {
    "type": "Polygon",
    "coordinates": [
        [[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0], [0.0, 0.0]],
        [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]],  # hole
    ],
}
MULTI = {
    "type": "MultiPolygon",
    "coordinates": [
        [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
        [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]],
    ],
}


def test_polygon_with_hole_roundtrip():
    wkb = geojson_to_wkb(POLY)
    polys = decode_wkb_polygons(wkb)
    assert len(polys) == 1 and len(polys[0]) == 2  # exterior + hole
    back = wkb_to_geojson(wkb)
    assert back["type"] == "Polygon"
    assert back["coordinates"] == POLY["coordinates"]


def test_multipolygon_roundtrip_and_wrappers():
    wkb = geojson_to_wkb(MULTI)
    assert wkb_to_geojson(wkb)["coordinates"] == MULTI["coordinates"]
    # Feature / FeatureCollection wrappers unwrap like GDAL OpenEx
    feat = {"type": "Feature", "properties": {}, "geometry": MULTI}
    fc = {"type": "FeatureCollection", "features": [feat]}
    assert geojson_to_wkb(feat) == wkb
    assert geojson_to_wkb(json.dumps(fc)) == wkb
    assert wkb_bounds(wkb) == (0.0, 0.0, 6.0, 6.0)


def test_errors():
    with pytest.raises(ValueError):
        geojson_to_wkb({"type": "Point", "coordinates": [0, 0]})
    with pytest.raises(ValueError):
        geojson_to_wkb({"type": "FeatureCollection", "features": []})
    with pytest.raises(ValueError):
        geojson_to_wkb({"type": "Feature", "geometry": None})


def test_significant_digits_like_godal():
    wkb = geojson_to_wkb(
        {
            "type": "Polygon",
            "coordinates": [
                [
                    [1.23456789012345678, -0.000123456789012345678],
                    [2.0, 0.0],
                    [2.0, 1.0],
                    [1.23456789012345678, -0.000123456789012345678],
                ]
            ],
        }
    )
    ring = wkb_to_geojson(wkb, significant_digits=12)["coordinates"][0]
    assert ring[0] == [1.23456789012, -0.000123456789012]


def test_cells_to_geojson_utm_parity():
    # one 30720 m cell of the regulargrid parity config (i=24, j_row=161
    # y-up), exported to geographic rings like CellsToJSON
    from geocube_spark.functions.crs import transform_points

    span = 30720.0
    cell = (24 * span, 161 * span, 25 * span, 162 * span)
    out = json.loads(cells_to_geojson([cell], cell_srid=32631))
    assert out["type"] == "MultiPolygon" and len(out["coordinates"]) == 1
    ring = np.asarray(out["coordinates"][0][0])
    assert ring.shape == (5, 2)
    assert np.allclose(ring[0], ring[-1])  # closed
    # corners equal the geographic transform of the UTM corners
    gx, gy = transform_points(
        32631, 4326, np.array([cell[0]]), np.array([cell[1]])
    )
    assert ring[0][0] == pytest.approx(float(gx[0]), abs=1e-9)
    assert ring[0][1] == pytest.approx(float(gy[0]), abs=1e-9)
    # AOI-ish sanity: the cell lands in the France test area
    assert 5.0 < ring[:, 0].mean() < 7.0 and 44.0 < ring[:, 1].mean() < 46.0


def test_cells_to_geojson_densify():
    out = json.loads(
        cells_to_geojson([(0.0, 0.0, 1.0, 1.0)], cell_srid=4326, densify=4)
    )
    ring = out["coordinates"][0][0]
    assert len(ring) == 4 * 4 + 1  # 4 points per edge + closure


def test_france_fixture_parses_through_codec():
    # the regulargrid parity fixture's multipolygon runs through the codec
    # and keeps both parts (mainland + Corsica)
    import os

    with open(
        os.path.join(os.path.dirname(__file__), "data", "regulargrid_parity.json")
    ) as f:
        fx = json.load(f)
    geo = {
        "type": "MultiPolygon",
        "coordinates": fx["france_multipolygon_lonlat"],
    }
    polys = decode_wkb_polygons(geojson_to_wkb(geo))
    assert len(polys) == 2
