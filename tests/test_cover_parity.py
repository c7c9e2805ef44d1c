"""Regular-grid cover parity with the reference's own test family.

Fixture: tests/data/regulargrid_parity.json — the three grid
configurations (30720 m / 40960 m cells in EPSG:32631, shifted origins)
and the exact cell-URI sets the reference's rasterized cover produces
(internal/utils/grid/regulargrid_test.go; the France AOI is its
test_data/france.geojson multipolygon, mainland + Corsica).

The repo's cover is the declarative two-phase plan (bbox candidate
explode + exact positive-area filter, operators/cover.py) and the AOI is
reprojected through the repo's own closed-form UTM kernel rather than
PROJ — the assertion is that the resulting CELL SET is identical, i.e.
both the grid indexing convention and the geometry handling agree with
the reference's GDAL-rasterized cover on a real country outline.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data", "regulargrid_parity.json")


@pytest.fixture(scope="module")
def fixture():
    with open(DATA) as f:
        return json.load(f)


def _to_utm31(ring_lonlat):
    from geocube_spark.functions.crs import transform_points

    arr = np.asarray(ring_lonlat, dtype=np.float64)
    x, y = transform_points(4326, 32631, arr[:, 0], arr[:, 1])
    return list(zip(x.tolist(), y.tolist()))


def _aoi_wkb(fixture, which):
    from geocube_spark.functions.geometry import multipolygon_wkb

    if which == "rect":
        return multipolygon_wkb([_to_utm31(fixture["rect_aoi_lonlat"])])
    rings = [
        _to_utm31(poly[0]) for poly in fixture["france_multipolygon_lonlat"]
    ]
    return multipolygon_wkb(rings)


def _reference_uri(i: int, j: int) -> str:
    # the reference's row index counts y-DOWN from the origin; the repo's
    # j counts y-up: row_ref = floor((oy - y)/span) = -j - 1
    return f"{i}/{-j - 1}"


@pytest.mark.parametrize("cfg_idx", [0, 1, 2])
def test_cover_matches_reference_cell_set(spark, fixture, cfg_idx):
    from geocube_spark.operators.cover import RegularGridSpec, cover_regular_wkb

    cfg = fixture["configs"][cfg_idx]
    spec = RegularGridSpec(
        crs="epsg:32631",
        cell_size=cfg["cell_size"],
        resolution=float(cfg["resolution"]),
        ox=float(cfg["ox"]),
        oy=float(cfg["oy"]),
    )
    wkb = _aoi_wkb(fixture, cfg["aoi"])
    got = sorted(
        _reference_uri(r["i"], r["j"])
        for r in cover_regular_wkb(spark, wkb, spec).collect()
    )
    assert got == sorted(cfg["expected"])
