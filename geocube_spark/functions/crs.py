"""Minimal CRS kernel (C6, R4, R5) — no pyproj in this environment.

Reference: internal/utils/proj/proj.go:26-73 (CRS parse + lon/lat<->CRS),
image.go:453-478 (WarpedExtent R4), handler_consolidation.go:502-526
(optimizeTransform R5).

Supported CRSs: EPSG:4326 (lon/lat) and EPSG:3857 (WebMercator) with exact
closed-form transforms, plus a plugin registry for custom transforms (the
C6 extension point).  This covers the engine's query-side needs (XYZ tiles,
extent warping, grid math); full projection support would plug pyproj into
``register_transform`` unchanged.
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable

import numpy as np

WGS84_A = 6378137.0
_MERC_LIMIT_LAT = 85.051128779806604  # atan(sinh(pi)) in degrees

Transform = Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]
_REGISTRY: dict[tuple[int, int], Transform] = {}


class CRSError(ValueError):
    pass


def parse_crs(text: str | int) -> int:
    """Parse user CRS input -> EPSG srid.  Accepts the same spec families as
    the reference (proj.go:47-73): EPSG codes ('epsg:NNNN', 'NNNN', ints),
    WKT1/WKT2 (resolved via the outermost AUTHORITY/ID clause), and proj4
    strings ('+init=epsg:NNNN', or recognized '+proj=' signatures for the
    built-in CRSs).  A full pyproj would subsume this unchanged; anything
    unrecognized raises CRSError rather than guessing."""
    if isinstance(text, int):
        return text
    m = re.fullmatch(r"(?i)\s*(?:epsg\s*:)?\s*(\d+)\s*", text)
    if m:
        return int(m.group(1))
    s = text.strip()
    # WKT1 (GEOGCS/PROJCS ... AUTHORITY["EPSG","NNNN"]) / WKT2 (GEOGCRS/
    # PROJCRS ... ID["EPSG",NNNN]): ONLY an authority clause at bracket
    # depth 1 identifies the outermost CRS.  A PROJCS with no top-level
    # authority but an inner GEOGCS one (common for custom projections)
    # must raise, not silently parse as the inner geographic code.
    if re.match(r"(?i)^(GEOG|PROJ|GEOD)(CS|CRS)\s*\[", s):
        srid = _wkt_toplevel_epsg(s)
        if srid is not None:
            return srid
        raise CRSError(
            f"WKT without a top-level EPSG authority: {s[:80]!r}"
        )
    if s.startswith("+"):
        m = re.search(r"(?i)\+init\s*=\s*epsg\s*:\s*(\d+)", s)
        if m:
            return int(m.group(1))
        if re.search(r"\+proj\s*=\s*longlat\b", s):
            # WGS84 only when stated or when NEITHER datum nor ellipsoid is
            # given (bare '+proj=longlat' defaults to WGS84); an explicit
            # non-WGS84 datum/ellps (GRS80, clrk66, intl, ...) must NOT be
            # silently treated as 4326.
            if "+datum=WGS84" in s or "+ellps=WGS84" in s or (
                "datum" not in s and "ellps" not in s
            ):
                return 4326
            raise CRSError(f"non-WGS84 geographic proj4 spec: {s!r}")
        if re.search(r"\+proj\s*=\s*merc\b", s) and "a=6378137" in s.replace(" ", ""):
            return 3857
        raise CRSError(f"unrecognized proj4 spec: {s!r}")
    raise CRSError(f"unsupported CRS spec: {text!r}")


_WKT_AUTH_RE = re.compile(
    r'(?i)(?:AUTHORITY|ID)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]'
)


def _wkt_toplevel_epsg(s: str) -> int | None:
    """Scan WKT tracking bracket depth; return the EPSG code of an
    AUTHORITY/ID clause that starts at depth 1 (a direct child of the
    outermost object), or None.  Quoted strings are skipped so brackets
    inside names don't skew the depth counter."""
    depth = 0
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == '"':
            # skip quoted string ("" is the WKT escape for a quote)
            i += 1
            while i < n:
                if s[i] == '"':
                    if i + 1 < n and s[i + 1] == '"':
                        i += 2
                        continue
                    break
                i += 1
        elif ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        elif depth == 1 and ch in "aAiI":
            m = _WKT_AUTH_RE.match(s, i)
            if m:
                return int(m.group(1))
        i += 1
    return None


def register_transform(src: int, dst: int, fn: Transform) -> None:
    _REGISTRY[(src, dst)] = fn


def _lonlat_to_webmercator(x, y):
    lat = np.clip(y, -_MERC_LIMIT_LAT, _MERC_LIMIT_LAT)
    mx = np.radians(x) * WGS84_A
    my = np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)) * WGS84_A
    return mx, my


def _webmercator_to_lonlat(x, y):
    lon = np.degrees(x / WGS84_A)
    lat = np.degrees(2 * np.arctan(np.exp(y / WGS84_A)) - np.pi / 2)
    return lon, lat


register_transform(4326, 3857, _lonlat_to_webmercator)
register_transform(3857, 4326, _webmercator_to_lonlat)


def resolve_transform(src: int, dst: int) -> Transform:
    """Resolve a transform ON THE DRIVER and return the callable itself.

    Operators that ship work to executors (the warp's applyInPandas) must
    resolve here at plan-build time and close over the returned function:
    closures are cloudpickled BY VALUE, so driver-registered transforms
    travel with the task — whereas a registry lookup inside the closure
    would consult the executor's freshly-imported (built-ins-only) module
    registry and fail for any register_transform() addition.  Also fails
    fast on the driver instead of at task runtime."""
    if src == dst:
        return lambda xs, ys: (xs, ys)
    fn = _REGISTRY.get((src, dst))
    if fn is None:
        raise CRSError(f"no transform registered for {src} -> {dst}")
    return fn


def transform_points(
    src: int, dst: int, xs: np.ndarray, ys: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    fn = resolve_transform(src, dst)
    return fn(np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64))


def warped_extent(
    src: int,
    dst: int,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    densify: int = 21,
) -> tuple[float, float, float, float]:
    """R4 WarpedExtent: transform the DENSIFIED boundary of the rect (not
    just corners — curved projections bow edges outward) and take min/max,
    the same contract as GDAL's suggested warp output bounds."""
    return warped_extent_with(
        resolve_transform(src, dst), xmin, ymin, xmax, ymax, densify
    )


def warped_extent_with(
    fn: Transform,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    densify: int = 21,
) -> tuple[float, float, float, float]:
    """warped_extent with a pre-resolved transform callable — the executor-
    safe form (see resolve_transform)."""
    t = np.linspace(0.0, 1.0, densify)
    edge_x = np.concatenate(
        [
            xmin + (xmax - xmin) * t,  # bottom
            np.full(densify, xmax),  # right
            xmax + (xmin - xmax) * t,  # top
            np.full(densify, xmin),  # left
        ]
    )
    edge_y = np.concatenate(
        [
            np.full(densify, ymin),
            ymin + (ymax - ymin) * t,
            np.full(densify, ymax),
            ymax + (ymin - ymax) * t,
        ]
    )
    wx, wy = fn(edge_x, edge_y)
    return float(wx.min()), float(wy.min()), float(wx.max()), float(wy.max())


def snap_transform(
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    resolution: float,
    block: int,
    origin: tuple[float, float] = (0.0, 0.0),
) -> tuple[float, float, int, int]:
    """R5 optimizeTransform (handler_consolidation.go:502-526): snap an
    extent to the block grid — origin aligned down to a block multiple,
    size rounded up to whole blocks.  Returns (ox, oy_top, width, height)."""
    step = resolution * block
    ox = origin[0] + math.floor((xmin - origin[0]) / step) * step
    oy = origin[1] + math.ceil((ymax - origin[1]) / step) * step  # top edge
    w_blocks = math.ceil((xmax - ox) / step)
    h_blocks = math.ceil((oy - ymin) / step)
    return ox, oy, w_blocks * block, h_blocks * block
