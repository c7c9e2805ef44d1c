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

import math
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


# ------------------------------------------------------- general polygons
#
# Union of ARBITRARY simple polygons (rotated quads, concave rings) — the
# full ST_Union domain of pg_containers.go:385-430, not just the
# rectilinear fast path above.  Vertical slab (trapezoidal) decomposition:
#
# * slab breaks: every vertex x plus every pairwise segment-intersection x
#   — inside a slab no two spanning edges cross, so ordering by midpoint y
#   is a total order and interval endpoints are LINEAR over the slab;
# * per polygon, spanning edges sorted by midpoint y pair up even-odd into
#   inside intervals (trapezoids);
# * across polygons, intervals merge by midpoint overlap (exact within the
#   slab — bounds cannot cross strictly inside it);
# * area = Σ trapezoid integrals; boundary = interval tops/bottoms plus
#   the symmetric difference of vertical coverage at each slab boundary,
#   linked into rings with interior-on-the-left (outers CCW, holes CW) —
#   the same convention as the rectilinear tracer, so hole assignment and
#   orientation logic are shared.
#
# Pure numpy/stdlib; runs inside the same bounded applyInPandas groups as
# rect_union.  O(E² log E) in the group's edge count — fine for job/cell
# groups (bounded dataset counts), never pointed at a whole corpus.


def _dedupe_ring(poly) -> np.ndarray | None:
    pts = np.asarray(poly, dtype=np.float64)
    if len(pts) >= 2 and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    keep = [0]
    for i in range(1, len(pts)):
        if not np.array_equal(pts[i], pts[keep[-1]]):
            keep.append(i)
    pts = pts[keep]
    if len(pts) < 3:
        return None
    x, y = pts[:, 0], pts[:, 1]
    area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    if area2 == 0.0:
        return None
    return pts


def _seg_intersection_xs(edges: list[tuple[float, float, float, float]]) -> list[float]:
    """x-coordinates of proper pairwise intersections (touch included)."""
    out: list[float] = []
    n = len(edges)
    for i in range(n):
        x1, y1, x2, y2 = edges[i]
        for j in range(i + 1, n):
            x3, y3, x4, y4 = edges[j]
            # quick reject on bboxes
            if max(x1, x2) < min(x3, x4) or max(x3, x4) < min(x1, x2):
                continue
            if max(y1, y2) < min(y3, y4) or max(y3, y4) < min(y1, y2):
                continue
            d = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
            if d == 0.0:
                continue  # parallel/collinear: endpoints are breaks already
            t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / d
            u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / d
            if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
                out.append(x1 + t * (x2 - x1))
    return out


def _y_at(e: tuple[float, float, float, float], x: float) -> float:
    x1, y1, x2, y2 = e
    if x2 == x1:
        return y1
    return y1 + (x - x1) * (y2 - y1) / (x2 - x1)


def poly_union(
    polys: list,
) -> tuple[list[tuple[np.ndarray, list[np.ndarray]]], float]:
    """Union of arbitrary simple polygons -> (polygons, exact_area), the
    same output contract as ``rect_union`` (outers CCW with CW holes)."""
    rings = [r for r in (_dedupe_ring(p) for p in polys) if r is not None]
    if not rings:
        return [], 0.0
    per_poly_edges: list[list[tuple[float, float, float, float]]] = []
    all_edges: list[tuple[float, float, float, float]] = []
    for r in rings:
        es = []
        n = len(r)
        for i in range(n):
            x1, y1 = r[i]
            x2, y2 = r[(i + 1) % n]
            es.append((float(x1), float(y1), float(x2), float(y2)))
        per_poly_edges.append(es)
        all_edges.extend(es)

    span = max(
        max(abs(e[0]) for e in all_edges),
        max(abs(e[1]) for e in all_edges),
        1.0,
    )
    eps = 1e-9 * span

    breaks = [e[0] for e in all_edges] + [e[2] for e in all_edges]
    breaks += _seg_intersection_xs(all_edges)
    xs = np.unique(np.asarray(breaks, dtype=np.float64))
    # collapse breaks closer than eps (intersection x computed vs vertex x)
    keep = [0]
    for i in range(1, len(xs)):
        if xs[i] - xs[keep[-1]] > eps:
            keep.append(i)
    xs = xs[keep]

    area = 0.0
    # per slab: list of (bot_ya, bot_yb, top_ya, top_yb)
    slab_intervals: list[list[tuple[float, float, float, float]]] = []
    for si in range(len(xs) - 1):
        xa, xb = float(xs[si]), float(xs[si + 1])
        xm = 0.5 * (xa + xb)
        merged: list[list[float]] = []  # [bot_ya, bot_yb, top_ya, top_yb, bot_ym, top_ym]
        cand: list[tuple[float, float, float, float, float]] = []
        for es in per_poly_edges:
            spans = [
                e
                for e in es
                if min(e[0], e[2]) <= xa + eps and max(e[0], e[2]) >= xb - eps
                and abs(e[0] - e[2]) > eps
            ]
            if not spans:
                continue
            evs = sorted(
                ((_y_at(e, xm), _y_at(e, xa), _y_at(e, xb)) for e in spans),
            )
            if len(evs) % 2:
                raise AssertionError(
                    f"odd edge parity in slab [{xa},{xb}] — degenerate input"
                )
            for k in range(0, len(evs), 2):
                bot, top = evs[k], evs[k + 1]
                cand.append((bot[0], bot[1], bot[2], top[1], top[2], top[0]))
        # merge across polygons by midpoint ordering
        for bot_ym, bot_ya, bot_yb, top_ya, top_yb, top_ym in sorted(cand):
            if merged and bot_ym <= merged[-1][5] + eps:
                if top_ym > merged[-1][5]:
                    merged[-1][3], merged[-1][4], merged[-1][5] = (
                        top_ya,
                        top_yb,
                        top_ym,
                    )
            else:
                merged.append([bot_ya, bot_yb, bot_ym, top_ya, top_yb, top_ym])
        ivs = [(m[0], m[1], m[3], m[4]) for m in merged]
        slab_intervals.append(ivs)
        for bot_ya, bot_yb, top_ya, top_yb in ivs:
            area += 0.5 * ((top_ya - bot_ya) + (top_yb - bot_yb)) * (xb - xa)

    # ---- boundary edges (interior on the LEFT)
    def key(x: float, y: float) -> tuple[float, float]:
        return (round(x / eps) if eps else x, round(y / eps) if eps else y)

    edges_out: dict[tuple, list[tuple]] = {}
    pts: dict[tuple, tuple[float, float]] = {}

    def add_edge(x1: float, y1: float, x2: float, y2: float) -> None:
        a, b = key(x1, y1), key(x2, y2)
        if a == b:
            return
        pts.setdefault(a, (x1, y1))
        pts.setdefault(b, (x2, y2))
        edges_out.setdefault(a, []).append(b)

    for si in range(len(xs) - 1):
        xa, xb = float(xs[si]), float(xs[si + 1])
        for bot_ya, bot_yb, top_ya, top_yb in slab_intervals[si]:
            add_edge(xa, bot_ya, xb, bot_yb)  # bottom: interior above, +x
            add_edge(xb, top_yb, xa, top_ya)  # top: interior below, -x

    # vertical walls at every slab boundary: symmetric difference of the
    # left slab's right-side coverage and the right slab's left-side
    # coverage, split at all interval endpoints
    for bi in range(len(xs)):
        x = float(xs[bi])
        left_cov = (
            [(iv[1], iv[3]) for iv in slab_intervals[bi - 1]] if bi > 0 else []
        )
        right_cov = (
            [(iv[0], iv[2]) for iv in slab_intervals[bi]]
            if bi < len(slab_intervals)
            else []
        )
        cuts = sorted(
            {y for iv in left_cov for y in iv} | {y for iv in right_cov for y in iv}
        )
        for k in range(len(cuts) - 1):
            lo, hi = cuts[k], cuts[k + 1]
            if hi - lo <= eps:
                continue
            ym = 0.5 * (lo + hi)
            in_l = any(a - eps <= ym <= b + eps for a, b in left_cov)
            in_r = any(a - eps <= ym <= b + eps for a, b in right_cov)
            if in_l == in_r:
                continue
            if in_r:  # west wall, interior east -> points down
                add_edge(x, hi, x, lo)
            else:  # east wall, interior west -> points up
                add_edge(x, lo, x, hi)

    # ---- link directed edges into rings (sharpest left turn at forks)
    rings_out: list[np.ndarray] = []
    while edges_out:
        start = next(iter(edges_out))
        path = [start]
        cur = start
        prev_dir: tuple[float, float] | None = None
        while True:
            cands = edges_out[cur]
            if len(cands) == 1 or prev_dir is None:
                nxt = cands[0]
            else:
                cx, cy = pts[cur]

                def turn(nk: tuple) -> float:
                    nx_, ny_ = pts[nk]
                    d = (nx_ - cx, ny_ - cy)
                    cross = prev_dir[0] * d[1] - prev_dir[1] * d[0]
                    dot = prev_dir[0] * d[0] + prev_dir[1] * d[1]
                    return math.atan2(cross, dot)  # (-pi, pi], left > 0

                nxt = max(cands, key=turn)
            cands.remove(nxt)
            if not cands:
                del edges_out[cur]
            px_, py_ = pts[cur]
            nx_, ny_ = pts[nxt]
            prev_dir = (nx_ - px_, ny_ - py_)
            path.append(nxt)
            cur = nxt
            if cur == start:
                break
        ring = np.array([pts[k] for k in path], dtype=np.float64)
        # collapse collinear runs (straight polygon edges chopped at slab
        # boundaries) — cross-product tolerance scaled to the span
        keep = [0]
        for k in range(1, len(ring) - 1):
            ax, ay = ring[keep[-1]]
            bx, by = ring[k]
            cx2, cy2 = ring[k + 1]
            cross = (bx - ax) * (cy2 - ay) - (by - ay) * (cx2 - ax)
            if abs(cross) <= eps * span:
                continue
            keep.append(k)
        keep.append(len(ring) - 1)
        ring = ring[keep]
        if len(ring) >= 4:
            rings_out.append(ring)

    outers = [r for r in rings_out if _ring_signed_area(r) > 0]
    holes = [r for r in rings_out if _ring_signed_area(r) < 0]
    out_polys: list[tuple[np.ndarray, list[np.ndarray]]] = []
    for outer in sorted(outers, key=_ring_signed_area, reverse=True):
        out_polys.append((outer, []))
    for hole in holes:
        hx = float(np.mean(hole[:-1, 0]))
        hy = float(np.mean(hole[:-1, 1]))
        owner = None
        for poly in sorted(out_polys, key=lambda p: _ring_signed_area(p[0])):
            if _point_in_ring(hx, hy, poly[0]):
                owner = poly
                break
        if owner is None:  # pragma: no cover
            raise AssertionError("hole without containing outer ring")
        owner[1].append(hole)

    shoelace = sum(_ring_signed_area(r) for r in rings_out)
    if abs(shoelace - area) > 1e-6 * max(1.0, abs(area)):  # pragma: no cover
        raise AssertionError(f"union tracing inconsistent: {shoelace} != {area}")
    return out_polys, area


def clip_poly_rect(
    poly, xmin: float, ymin: float, xmax: float, ymax: float
) -> list[tuple[float, float]]:
    """Sutherland–Hodgman clip of a simple polygon to an axis-aligned rect
    (A2's cell ring ∩ shape; the cell is always convex)."""
    pts = [(float(x), float(y)) for x, y in poly]

    def clip(points, inside, intersect):
        out = []
        n = len(points)
        for i in range(n):
            a, b = points[i], points[(i + 1) % n]
            ia, ib = inside(a), inside(b)
            if ia:
                out.append(a)
                if not ib:
                    out.append(intersect(a, b))
            elif ib:
                out.append(intersect(a, b))
        return out

    def x_cut(x0):
        def f(a, b):
            t = (x0 - a[0]) / (b[0] - a[0])
            return (x0, a[1] + t * (b[1] - a[1]))

        return f

    def y_cut(y0):
        def f(a, b):
            t = (y0 - a[1]) / (b[1] - a[1])
            return (a[0] + t * (b[0] - a[0]), y0)

        return f

    pts = clip(pts, lambda p: p[0] >= xmin, x_cut(xmin))
    if pts:
        pts = clip(pts, lambda p: p[0] <= xmax, x_cut(xmax))
    if pts:
        pts = clip(pts, lambda p: p[1] >= ymin, y_cut(ymin))
    if pts:
        pts = clip(pts, lambda p: p[1] <= ymax, y_cut(ymax))
    return pts


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


def rect_buffer(rects: list[Rect], d: float) -> tuple[list, float]:
    """Chebyshev (L-inf / square structuring element) buffer of a
    rectilinear region given as covering rects — EXACT on this domain.

    d > 0 (dilation): Minkowski dilation commutes with union, so inflate
    each rect by d and union.  d < 0 (erosion): the complement trick —
    erode(P, r) = frame minus dilate(frame minus P, r) — carried out on
    the coordinate-compressed cell grid, where the complement of a rect
    union (within a frame inflated past the erosion radius) is itself a
    set of rects.  d == 0 is the plain union.

    Returns the same (polygons, exact_area) shape as :func:`rect_union`.
    """
    if d >= 0:
        return rect_union(
            [(x0 - d, y0 - d, x1 + d, y1 + d) for x0, y0, x1, y1 in rects]
        )
    r = -float(d)
    rs = [
        (float(x0), float(y0), float(x1), float(y1))
        for x0, y0, x1, y1 in rects
        if x1 > x0 and y1 > y0
    ]
    if not rs:
        return [], 0.0
    # frame extends past every rect by > r so the dilated complement
    # reaches around the region from all sides
    fx0 = min(x0 for x0, _, _, _ in rs) - 2 * r
    fy0 = min(y0 for _, y0, _, _ in rs) - 2 * r
    fx1 = max(x1 for _, _, x1, _ in rs) + 2 * r
    fy1 = max(y1 for _, _, _, y1 in rs) + 2 * r
    xs = np.unique(np.array([fx0, fx1] + [v for rr in rs for v in (rr[0], rr[2])]))
    ys = np.unique(np.array([fy0, fy1] + [v for rr in rs for v in (rr[1], rr[3])]))
    covered = np.zeros((len(xs) - 1, len(ys) - 1), dtype=bool)
    for x0, y0, x1, y1 in rs:
        i0, i1 = np.searchsorted(xs, x0), np.searchsorted(xs, x1)
        j0, j1 = np.searchsorted(ys, y0), np.searchsorted(ys, y1)
        covered[i0:i1, j0:j1] = True
    # complement cells as rects, dilated by r
    comp_rects = [
        (xs[i] - r, ys[j] - r, xs[i + 1] + r, ys[j + 1] + r)
        for i in range(len(xs) - 1)
        for j in range(len(ys) - 1)
        if not covered[i, j]
    ]
    # eroded region = union rects minus dilated complement: compute on a
    # refined grid including the +/- r offsets
    offs = [v for rr in comp_rects for v in (rr[0], rr[2])]
    xs2 = np.unique(np.concatenate([xs, np.array(offs)])) if offs else xs
    offs_y = [v for rr in comp_rects for v in (rr[1], rr[3])]
    ys2 = np.unique(np.concatenate([ys, np.array(offs_y)])) if offs_y else ys
    cov2 = np.zeros((len(xs2) - 1, len(ys2) - 1), dtype=bool)
    for x0, y0, x1, y1 in rs:
        i0, i1 = np.searchsorted(xs2, x0), np.searchsorted(xs2, x1)
        j0, j1 = np.searchsorted(ys2, y0), np.searchsorted(ys2, y1)
        cov2[i0:i1, j0:j1] = True
    for x0, y0, x1, y1 in comp_rects:
        i0, i1 = np.searchsorted(xs2, x0), np.searchsorted(xs2, x1)
        j0, j1 = np.searchsorted(ys2, y0), np.searchsorted(ys2, y1)
        cov2[i0:i1, j0:j1] = False  # subtract the dilated complement
    dx = np.diff(xs2)[:, None]
    dy = np.diff(ys2)[None, :]
    area = float((cov2 * dx * dy).sum())
    rings = _trace_contours(cov2, xs2, ys2)
    outers = [(ring, _ring_signed_area(ring)) for ring in rings if _ring_signed_area(ring) > 0]
    holes = [(ring, _ring_signed_area(ring)) for ring in rings if _ring_signed_area(ring) < 0]
    polys: list[tuple[np.ndarray, list[np.ndarray]]] = []
    for outer, _a in outers:
        polys.append((outer, []))
    for hole, _a in holes:
        hx, hy = float(hole[0][0]), float(hole[0][1])
        for outer, hs in polys:  # attach to the first containing outer
            if _point_in_ring(hx, hy, outer):
                hs.append(hole)
                break
    return polys, area
