"""Pure-python/numpy geometry kernel (no shapely/pyproj in this environment).

Scope mirrors what the reference actually uses for catalog queries
(SURVEY C3-C6, F7/F8/F14, O3/O4):

- WKB encode/decode for Polygon / MultiPolygon (NDR), go-geom compatible
- sha1(WKB) geometry hash for AOI dedup (record.go:33-46)
- bbox extraction + bbox-intersects column predicates (the cheap phase of the
  two-phase spatial filter; exact refinement is a pandas UDF)
- polygon area / point-in-polygon / convex clip (Sutherland–Hodgman) for the
  exact phase over the rectangular/convex fixture geometries
- antimeridian split of lon-spanning rings (pg_containers.go:124-167)

Design: the cheap phase is pure Column arithmetic on the persisted bbox
struct — it pushes into Parquet min/max skipping.  The exact phase is an
Arrow-batched pandas UDF, applied only to bbox survivors (same two-phase
order as the reference's ST_Intersects -> ST_Relate).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

Ring = Sequence[tuple[float, float]]

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

# ------------------------------------------------------------------ WKB codec


def polygon_wkb(exterior: Ring) -> bytes:
    """Encode a single-ring polygon as little-endian WKB.  The ring is closed
    automatically (first point appended) like the reference's linear-ring
    promotion (record.go:33-46)."""
    pts = list(exterior)
    if pts[0] != pts[-1]:
        pts = pts + [pts[0]]
    out = [struct.pack("<BII", 1, _WKB_POLYGON, 1), struct.pack("<I", len(pts))]
    for x, y in pts:
        out.append(struct.pack("<dd", float(x), float(y)))
    return b"".join(out)


def multipolygon_wkb(polygons: Iterable[Ring]) -> bytes:
    polys = [polygon_wkb(p) for p in polygons]
    return struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polys)) + b"".join(polys)


def rect_wkb(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    return polygon_wkb([(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)])


def decode_wkb(buf: bytes) -> list[list[tuple[float, float]]]:
    """Decode Polygon/MultiPolygon WKB -> list of exterior rings (interior
    rings are parsed but dropped; fixtures have none)."""

    def read_polygon(off: int) -> tuple[list[tuple[float, float]], int]:
        byte_order, geom_type = struct.unpack_from("<BI", buf, off)
        assert byte_order == 1 and geom_type == _WKB_POLYGON, (byte_order, geom_type)
        off += 5
        (n_rings,) = struct.unpack_from("<I", buf, off)
        off += 4
        exterior: list[tuple[float, float]] = []
        for r in range(n_rings):
            (n_pts,) = struct.unpack_from("<I", buf, off)
            off += 4
            pts = list(struct.iter_unpack("<dd", buf[off : off + 16 * n_pts]))
            off += 16 * n_pts
            if r == 0:
                exterior = [(p[0], p[1]) for p in pts]
        return exterior, off

    byte_order, geom_type = struct.unpack_from("<BI", buf, 0)
    if geom_type == _WKB_POLYGON:
        ring, _ = read_polygon(0)
        return [ring]
    assert geom_type == _WKB_MULTIPOLYGON, geom_type
    (n,) = struct.unpack_from("<I", buf, 5)
    off = 9
    rings = []
    for _ in range(n):
        ring, off = read_polygon(off)
        rings.append(ring)
    return rings


def geom_hash(wkb: bytes) -> str:
    """sha1 of canonical WKB — AOI dedup key (record.go:33-46)."""
    return hashlib.sha1(wkb).hexdigest()


def wkb_bounds(buf: bytes) -> tuple[float, float, float, float]:
    rings = decode_wkb(buf)
    xs = [x for r in rings for x, _ in r]
    ys = [y for r in rings for _, y in r]
    return min(xs), min(ys), max(xs), max(ys)


# ------------------------------------------------------- cheap phase (bboxes)


def bbox_intersects(bbox: Column, xmin: float, ymin: float, xmax: float, ymax: float) -> Column:
    """Column predicate: dataset bbox ∩ query rect ≠ ∅.  Pure comparisons on
    the persisted struct — Parquet row-group min/max stats skip files."""
    return (
        (bbox["xmin"] <= F.lit(float(xmax)))
        & (bbox["xmax"] >= F.lit(float(xmin)))
        & (bbox["ymin"] <= F.lit(float(ymax)))
        & (bbox["ymax"] >= F.lit(float(ymin)))
    )


def bbox_intersects_sql(bbox_col: str, xmin: float, ymin: float, xmax: float, ymax: float) -> str:
    return (
        f"{bbox_col}.xmin <= {xmax} AND {bbox_col}.xmax >= {xmin} "
        f"AND {bbox_col}.ymin <= {ymax} AND {bbox_col}.ymax >= {ymin}"
    )


# ------------------------------------------------------ exact phase (numpy)


def _ring_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def clip_convex(subject: list[tuple[float, float]], clip_rect: tuple[float, float, float, float]):
    """Sutherland–Hodgman clip of a polygon by an axis-aligned rect.
    Exact for the convex fixture geometries; returns the clipped ring."""
    xmin, ymin, xmax, ymax = clip_rect
    edges = [
        lambda p: p[0] >= xmin,
        lambda p: p[0] <= xmax,
        lambda p: p[1] >= ymin,
        lambda p: p[1] <= ymax,
    ]
    intersect = [
        lambda a, b: (xmin, a[1] + (b[1] - a[1]) * (xmin - a[0]) / (b[0] - a[0])),
        lambda a, b: (xmax, a[1] + (b[1] - a[1]) * (xmax - a[0]) / (b[0] - a[0])),
        lambda a, b: (a[0] + (b[0] - a[0]) * (ymin - a[1]) / (b[1] - a[1]), ymin),
        lambda a, b: (a[0] + (b[0] - a[0]) * (ymax - a[1]) / (b[1] - a[1]), ymax),
    ]
    ring = [p for p in subject]
    if ring and ring[0] == ring[-1]:
        ring = ring[:-1]
    for inside, cross in zip(edges, intersect):
        if not ring:
            return []
        out = []
        prev = ring[-1]
        for cur in ring:
            if inside(cur):
                if not inside(prev):
                    out.append(cross(prev, cur))
                out.append(cur)
            elif inside(prev):
                out.append(cross(prev, cur))
            prev = cur
        ring = out
    return ring


def polygon_interior_intersects_rect(
    wkb: bytes, rect: tuple[float, float, float, float]
) -> bool:
    """Interior-intersects (the ST_Relate 'T********' refinement, F8): the
    clipped region must have positive area, not just touching boundaries."""
    for ring in decode_wkb(wkb):
        clipped = clip_convex(ring, rect)
        if len(clipped) >= 3 and abs(_ring_area(np.asarray(clipped))) > 1e-12:
            return True
    return False


def make_intersects_udf(rect: tuple[float, float, float, float]):
    """Arrow-batched pandas UDF: exact interior-intersects vs a fixed query
    rect.  Applied after the bbox prune, matching the reference's two-phase
    evaluation order (O3)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BooleanType())
    def exact_intersects(wkb_s: pd.Series) -> pd.Series:
        return wkb_s.apply(lambda b: polygon_interior_intersects_rect(bytes(b), rect))

    return exact_intersects


# ------------------------------------------------- antimeridian (F14 / O4)


def split_antimeridian_rect(
    xmin: float, ymin: float, xmax: float, ymax: float
) -> list[tuple[float, float, float, float]]:
    """Split a lon-range that crosses the antimeridian (xmin > xmax after
    normalization to [-180,180]) into <=2 plain rects, mirroring
    pg_containers.go:124-167's split-and-recollect."""
    if xmin <= xmax:
        return [(xmin, ymin, xmax, ymax)]
    return [(xmin, ymin, 180.0, ymax), (-180.0, ymin, xmax, ymax)]


def densify_ring(ring: Ring, max_step: float = 1.0) -> list[tuple[float, float]]:
    """Insert intermediate vertices so no segment exceeds max_step degrees —
    the planar analogue of proj.go:287-460's geodesic densification."""
    pts = list(ring)
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    out: list[tuple[float, float]] = []
    for (x0, y0), (x1, y1) in zip(pts[:-1], pts[1:]):
        seg = max(abs(x1 - x0), abs(y1 - y0))
        n = max(1, int(np.ceil(seg / max_step)))
        for k in range(n):
            t = k / n
            out.append((x0 + (x1 - x0) * t, y0 + (y1 - y0) * t))
    out.append(pts[-1])
    return out
