"""Exact rectilinear polygon union (A1/A2).

The reference unions locked-dataset footprints with PostGIS ``ST_Union``
to build consolidation AOIs (``interface/database/pg/pg_containers.go:
385-430``).  Dataset footprints in this engine are axis-aligned rects
(tile-grid extents — the reference's consolidation inputs are the same
tile-aligned shapes), so the union is computed EXACTLY on the rectilinear
domain rather than approximated by an envelope:

* breakpoints: the sorted distinct x's and y's of all rect corners form a
  non-uniform grid; every grid cell is either fully inside or fully
  outside the union (rect edges only lie on grid lines);
* coverage: a cell is inside iff some rect contains it;
* boundary: directed cell-border edges with covered-on-the-LEFT link into
  closed contours (outer rings come out CCW, holes CW — orientation falls
  out of the convention); collinear runs collapse.

Output is a true multipolygon (rings with holes), its EXACT area (the sum
of covered cell areas — asserted equal to the shoelace area of the traced
rings), and WKB via ``functions/geometry.py`` encoding.

The kernel is an associative per-group reduction: at cluster scale it
runs inside ``applyInPandas`` per job/cell group (bounded by the job's
locked-dataset count), and partial unions of rect subsets can pre-reduce
map-side because union is associative.
"""

from __future__ import annotations

import struct

import numpy as np

Rect = tuple[float, float, float, float]  # xmin, ymin, xmax, ymax


def _trace_contours(
    covered: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> list[np.ndarray]:
    """Link boundary edges of the covered-cell mask into closed contours.

    Edges are directed with the covered region on the LEFT; at a vertex
    the next edge is chosen by the sharpest left turn, which keeps
    contours simple at checkerboard corners.  Returns rings as (k, 2)
    float arrays (closed: first == last), CCW for outers, CW for holes."""
    nx, ny = covered.shape
    # directed edges on grid vertices (i, j) -> covered on the left.
    # vertex (i, j) = (xs[i], ys[j]).
    out_edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(a: tuple[int, int], b: tuple[int, int]) -> None:
        out_edges.setdefault(a, []).append(b)

    def cov(i: int, j: int) -> bool:
        return 0 <= i < nx and 0 <= j < ny and bool(covered[i, j])

    for i in range(nx):
        for j in range(ny):
            if not covered[i, j]:
                continue
            if not cov(i, j - 1):  # bottom edge, region above: left -> right
                add((i, j), (i + 1, j))
            if not cov(i, j + 1):  # top edge, region below: right -> left
                add((i + 1, j + 1), (i, j + 1))
            if not cov(i - 1, j):  # left edge, region right: top -> bottom
                add((i, j + 1), (i, j))
            if not cov(i + 1, j):  # right edge, region left: bottom -> top
                add((i + 1, j), (i + 1, j + 1))

    rings: list[np.ndarray] = []
    while out_edges:
        start = next(iter(out_edges))
        path = [start]
        cur = start
        prev_dir: tuple[int, int] | None = None
        while True:
            cands = out_edges[cur]
            if len(cands) == 1 or prev_dir is None:
                nxt = cands[0]
            else:
                # sharpest left turn relative to the incoming direction
                def turn(nv: tuple[int, int]) -> int:
                    d = (nv[0] - cur[0], nv[1] - cur[1])
                    cross = prev_dir[0] * d[1] - prev_dir[1] * d[0]
                    dot = prev_dir[0] * d[0] + prev_dir[1] * d[1]
                    # left turn > straight > right turn
                    return 2 if cross > 0 else (1 if dot > 0 else 0)

                nxt = max(cands, key=turn)
            cands.remove(nxt)
            if not cands:
                del out_edges[cur]
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            path.append(nxt)
            cur = nxt
            if cur == start:
                break
        pts = np.array([[xs[i], ys[j]] for i, j in path], dtype=np.float64)
        # collapse collinear runs (axis-aligned: drop midpoints of straight
        # segments), keeping the closing vertex
        keep = [0]
        for k in range(1, len(pts) - 1):
            a, b, c = pts[keep[-1]], pts[k], pts[k + 1]
            if (a[0] == b[0] == c[0]) or (a[1] == b[1] == c[1]):
                continue
            keep.append(k)
        keep.append(len(pts) - 1)
        rings.append(pts[keep])
    return rings


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return float(np.sum(x * y2 - x2 * y) / 2.0)


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    inside = False
    for k in range(len(ring) - 1):
        x1, y1 = ring[k]
        x2, y2 = ring[k + 1]
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def rect_union(rects: list[Rect]) -> tuple[list[tuple[np.ndarray, list[np.ndarray]]], float]:
    """Union of axis-aligned rects -> (polygons, exact_area).

    ``polygons`` is a list of (outer_ring CCW, [hole_rings CW]); the area
    is the covered-cell sum, asserted equal to the rings' shoelace area to
    1 ulp-scale tolerance (an internal consistency proof of the tracing).
    Degenerate (zero-extent) rects are dropped."""
    rs = [
        (float(x0), float(y0), float(x1), float(y1))
        for x0, y0, x1, y1 in rects
        if x1 > x0 and y1 > y0
    ]
    if not rs:
        return [], 0.0
    xs = np.unique(np.array([r[0] for r in rs] + [r[2] for r in rs]))
    ys = np.unique(np.array([r[1] for r in rs] + [r[3] for r in rs]))
    nx, ny = len(xs) - 1, len(ys) - 1
    covered = np.zeros((nx, ny), dtype=bool)
    for x0, y0, x1, y1 in rs:
        i0, i1 = np.searchsorted(xs, x0), np.searchsorted(xs, x1)
        j0, j1 = np.searchsorted(ys, y0), np.searchsorted(ys, y1)
        covered[i0:i1, j0:j1] = True
    dx = np.diff(xs)[:, None]
    dy = np.diff(ys)[None, :]
    area = float((covered * dx * dy).sum())

    rings = _trace_contours(covered, xs, ys)
    outers = [(r, _ring_signed_area(r)) for r in rings if _ring_signed_area(r) > 0]
    holes = [(r, _ring_signed_area(r)) for r in rings if _ring_signed_area(r) < 0]
    polys: list[tuple[np.ndarray, list[np.ndarray]]] = []
    for outer, _ in sorted(outers, key=lambda t: -t[1]):
        polys.append((outer, []))
    for hole, _ in holes:
        # attach to the smallest outer containing a hole vertex interior
        px, py = float(hole[0, 0]), float(hole[0, 1])
        # probe just inside the hole's first corner along its first edge
        probe_x = (float(hole[0, 0]) + float(hole[1, 0])) / 2.0
        probe_y = (float(hole[0, 1]) + float(hole[1, 1])) / 2.0
        owner = None
        for poly in sorted(polys, key=lambda p: _ring_signed_area(p[0])):
            if _point_in_ring(probe_x, probe_y, poly[0]) or _point_in_ring(px + 1e-9, py + 1e-9, poly[0]):
                owner = poly
                break
        if owner is None:  # pragma: no cover - tracing guarantees an owner
            raise AssertionError("hole without containing outer ring")
        owner[1].append(hole)

    shoelace = sum(_ring_signed_area(r) for r in rings)
    if abs(shoelace - area) > 1e-6 * max(1.0, area):  # pragma: no cover
        raise AssertionError(f"union tracing inconsistent: {shoelace} != {area}")
    return polys, area


def union_wkb(polys: list[tuple[np.ndarray, list[np.ndarray]]]) -> bytes:
    """Little-endian WKB MultiPolygon from (outer, holes) ring lists."""
    def ring_bytes(ring: np.ndarray) -> bytes:
        out = struct.pack("<I", len(ring))
        for x, y in ring:
            out += struct.pack("<dd", float(x), float(y))
        return out

    buf = struct.pack("<BII", 1, 6, len(polys))  # NDR, MultiPolygon
    for outer, holes in polys:
        buf += struct.pack("<BII", 1, 3, 1 + len(holes))  # NDR, Polygon
        buf += ring_bytes(outer)
        for h in holes:
            buf += ring_bytes(h)
    return buf
