"""GeoJSON <-> WKB codec + grid-cell GeoJSON export.

Reference parity surfaces:
- AOIs arrive as GeoJSON geometries in the reference's API and test
  fixtures (`/root/reference/internal/utils/grid/test_data/france.geojson`,
  read via GDAL in `regulargrid_test.go`); here the same payloads decode
  straight into the repo's WKB pipeline (functions/geometry.py) with no
  GDAL dependency.
- `cells_to_geojson` mirrors `CellsToJSON`
  (`/root/reference/internal/utils/grid/abstractgrid.go:92-107`): a set
  of covered grid cells exported as ONE GeoJSON MultiPolygon of their
  geographic (EPSG:4326) rings, coordinates trimmed to significant
  digits like godal's SignificantDigits(12) option.

Driver-side utilities (AOIs and cell lists are dim-sized); the heavy
geometry math stays in the existing WKB operators.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterable

from geocube_spark.functions.geometry import (
    decode_wkb_polygons,
    multipolygon_wkb,
    polygon_wkb,
)


def _unwrap_geometry(obj: dict) -> dict:
    """Accept a bare geometry, a Feature, or a FeatureCollection (first
    feature) — the same lenient loading GDAL's OpenEx does for the
    reference's france.geojson fixture."""
    t = obj.get("type")
    if t == "FeatureCollection":
        feats = obj.get("features") or []
        if not feats:
            raise ValueError("GeoJSON FeatureCollection has no features")
        return _unwrap_geometry(feats[0])
    if t == "Feature":
        geom = obj.get("geometry")
        if geom is None:
            raise ValueError("GeoJSON Feature has null geometry")
        return geom
    return obj


def geojson_to_wkb(obj: dict | str) -> bytes:
    """GeoJSON Polygon/MultiPolygon (optionally wrapped in a Feature /
    FeatureCollection) -> little-endian WKB.  Interior rings (holes) are
    preserved."""
    if isinstance(obj, str):
        obj = json.loads(obj)
    geom = _unwrap_geometry(obj)
    t = geom.get("type")
    if t == "Polygon":
        rings = geom["coordinates"]
        if not rings:
            raise ValueError("GeoJSON Polygon has no rings")
        return polygon_wkb(
            [(float(x), float(y)) for x, y, *_ in rings[0]],
            [[(float(x), float(y)) for x, y, *_ in r] for r in rings[1:]],
        )
    if t == "MultiPolygon":
        import struct

        polys = []
        for rings in geom["coordinates"]:
            if not rings:
                continue
            polys.append(
                polygon_wkb(
                    [(float(x), float(y)) for x, y, *_ in rings[0]],
                    [[(float(x), float(y)) for x, y, *_ in r] for r in rings[1:]],
                )
            )
        return struct.pack("<BII", 1, 6, len(polys)) + b"".join(polys)
    raise ValueError(f"unsupported GeoJSON geometry type: {t!r}")


def _sig(x: float, digits: int) -> float:
    """Round to ``digits`` SIGNIFICANT digits (godal SignificantDigits
    semantics), keeping -0.0 out of the output."""
    if x == 0 or not math.isfinite(x):
        return 0.0 if x == 0 else x
    v = round(x, digits - 1 - int(math.floor(math.log10(abs(x)))))
    return v + 0.0  # normalize -0.0


def wkb_to_geojson(buf: bytes, significant_digits: int = 12) -> dict:
    """WKB Polygon/MultiPolygon -> GeoJSON geometry dict.  Multi-part
    input always exports as MultiPolygon (the reference's cell export
    shape); single polygons export as Polygon."""
    polys = decode_wkb_polygons(bytes(buf))
    coords = [
        [
            [
                [_sig(float(x), significant_digits), _sig(float(y), significant_digits)]
                for x, y in ring.tolist()
            ]
            for ring in poly
        ]
        for poly in polys
    ]
    if len(coords) == 1:
        return {"type": "Polygon", "coordinates": coords[0]}
    return {"type": "MultiPolygon", "coordinates": coords}


def cells_to_geojson(
    cells: Iterable[tuple[float, float, float, float]],
    cell_srid: int = 4326,
    significant_digits: int = 12,
    densify: int = 1,
) -> str:
    """Covered grid cells -> ONE GeoJSON MultiPolygon of their GEOGRAPHIC
    rings (CellsToJSON parity, abstractgrid.go:92-107): each cell rect in
    the grid CRS becomes a ring, reprojected to EPSG:4326.

    ``densify`` > 1 inserts intermediate points per edge before the
    reprojection so strongly curved cells (polar grids) keep their true
    geographic shape — the reference's GeographicRing carries the same
    densification concern."""
    from geocube_spark.functions.crs import resolve_transform

    import numpy as np

    inv = resolve_transform(cell_srid, 4326)
    polys = []
    for xmin, ymin, xmax, ymax in cells:
        xs, ys = [], []
        corners = [
            (xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)
        ]
        for (x0, y0), (x1, y1) in zip(corners, corners[1:]):
            for s in range(densify):
                t = s / densify
                xs.append(x0 + (x1 - x0) * t)
                ys.append(y0 + (y1 - y0) * t)
        xs.append(xmin)
        ys.append(ymin)
        gx, gy = inv(np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64))
        polys.append(
            [
                [
                    [_sig(float(x), significant_digits), _sig(float(y), significant_digits)]
                    for x, y in zip(gx.tolist(), gy.tolist())
                ]
            ]
        )
    return json.dumps({"type": "MultiPolygon", "coordinates": polys})
