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


def test_singlecell_reference_cell(spark):
    """Ported reference test (singlecellgrid_test.go): the lon/lat rect
    AOI reprojected to EPSG:32631 at 10 m becomes ONE cell with the
    reference's exact URI components, and its geographic ring matches the
    reference's CellsToJSON output (tolerances cover closed-form-Krueger
    vs PROJ, sub-mm in the CRS, ~1e-7 deg geographic)."""
    import json

    import numpy as np

    from geocube_spark.functions.crs import transform_points
    from geocube_spark.functions.geojson import cells_to_geojson
    from geocube_spark.operators.cover import RegularGridSpec, cover_singlecell

    ring = [(5.8, 45.1), (5.8, 44.5), (6.6, 44.5), (6.6, 45.1), (5.8, 45.1)]
    arr = np.asarray(ring)
    x, y = transform_points(4326, 32631, arr[:, 0], arr[:, 1])
    rect = (float(x.min()), float(y.min()), float(x.max()), float(y.max()))
    spec = RegularGridSpec(crs="epsg:32631", cell_size=1, resolution=10.0)
    ox, oy, w, h = cover_singlecell([rect], spec)
    # reference URI: 720298.4297198909/5000366.394349512/6590/6914
    assert abs(ox - 720298.4297198909) < 1e-3
    assert abs(oy - 5000366.394349512) < 1e-3
    assert (w, h) == (6590, 6914)
    # Cell -> CellsToJSON parity on the reference's parsed-URI cell
    cox, coy, cw, ch = 720298.429720, 5000366.394350, 6590, 6914
    out = json.loads(
        cells_to_geojson(
            [(cox, coy - ch * 10.0, cox + cw * 10.0, coy)], cell_srid=32631
        )
    )
    got = np.asarray(out["coordinates"][0][0][:4])
    want = np.asarray(
        [
            [5.771142340276, 44.500735020838],
            [5.801096927991, 45.12241193432],
            [6.637518180705, 45.098809626962],
            [6.598660882864, 44.47763583486],
        ]
    )
    # compare as corner SETS (ring starting point/orientation differ)
    for wx, wy in want:
        d = np.abs(got - [wx, wy]).sum(axis=1).min()
        assert d < 2e-7, (wx, wy, got)
