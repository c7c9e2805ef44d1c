"""Minimal CRS kernel (C6, R4, R5) — no pyproj in this environment.

Reference: internal/utils/proj/proj.go:26-73 (CRS parse + lon/lat<->CRS),
image.go:453-478 (WarpedExtent R4), handler_consolidation.go:502-526
(optimizeTransform R5).

Supported CRSs with exact closed-form transforms: EPSG:4326 (lon/lat),
EPSG:3857 (WebMercator), EPSG:326xx/327xx (UTM, order-n⁶ Krüger), and the
polar stereographic family EPSG:3031/3413/5041/5042 (Snyder closed form) —
i.e. the CRSs real satellite products actually ship in (MGRS/UTM tiling,
polar science grids) — plus LCC/AEA/LAEA/TM national grids.  Beyond the
EPSG registry, ``crs_from_parameters`` constructs ANY parameter set of
those families (from proj4 or WKT PARAMETER clauses) on the WGS84/GRS80
ellipsoid — the reference's accept-anything PROJ behavior for the families
the closed-form kernels implement.  A plugin registry covers the rest (the
C6 extension point); a full pyproj would plug into ``register_transform``
unchanged.
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
        # no top-level authority: construct from the projection parameters
        # (the reference's PROJ accepts any parameter set — proj.go:47-73)
        srid = _wkt_projcs_from_parameters(s)
        if srid is not None:
            return srid
        raise CRSError(
            f"WKT without a top-level EPSG authority or projection "
            f"parameters: {s[:80]!r}"
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
        m = re.search(r"\+proj\s*=\s*utm\b", s)
        if m:
            zm = re.search(r"\+zone\s*=\s*(\d+)", s)
            if not zm:
                raise CRSError(f"utm proj4 spec without +zone: {s!r}")
            zone = int(zm.group(1))
            if not 1 <= zone <= 60:
                raise CRSError(f"utm zone out of range: {zone}")
            if not (
                "+datum=WGS84" in s or "+ellps=WGS84" in s or (
                    "datum" not in s and "ellps" not in s
                )
            ):
                raise CRSError(f"non-WGS84 utm proj4 spec: {s!r}")
            return (32700 if re.search(r"\+south\b", s) else 32600) + zone
        if re.search(r"\+proj\s*=\s*stere\b", s):
            lat0 = _proj4_num(s, "lat_0")
            if lat0 not in (90.0, -90.0):
                raise CRSError(f"non-polar stereographic proj4 spec: {s!r}")
            south = lat0 == -90.0
            lat_ts = _proj4_num(s, "lat_ts")
            k0 = _proj4_num(s, "k") or _proj4_num(s, "k_0")
            lon0 = _proj4_num(s, "lon_0") or 0.0
            fe = _proj4_num(s, "x_0") or 0.0
            fn = _proj4_num(s, "y_0") or 0.0
            for srid, (sth, ts, kk, l0, e0, n0) in _PS_PARAMS.items():
                if sth == south and lat_ts == ts and (
                    k0 == kk or (k0 is None and kk is None)
                ) and (lon0, fe, fn) == (l0, e0, n0):
                    return srid
            _require_wgs84_proj4(s)
            return crs_from_parameters(
                "stere", lat_0=lat0, lon_0=lon0, lat_ts=lat_ts, k_0=k0,
                x_0=fe, y_0=fn,
            )
        if re.search(r"\+proj\s*=\s*(lcc|aea|tmerc|laea)\b", s):
            srid = _proj4_match_registered(s)
            if srid is not None:
                return srid
            # unregistered parameter set: construct it (proj.go:47-73
            # accepts any parameters; same here for the implemented
            # families, WGS84/GRS80 ellipsoid only — the matcher above is
            # ellipsoid-aware, so a bessel/intl spec whose numbers happen
            # to coincide with a WGS84-family grid falls through and raises
            _require_wgs84_proj4(s)
            fam = re.search(r"\+proj\s*=\s*(\w+)", s).group(1)
            return crs_from_parameters(
                fam,
                lat_0=_proj4_num(s, "lat_0") or 0.0,
                lon_0=_proj4_num(s, "lon_0") or 0.0,
                lat_1=_proj4_num(s, "lat_1"),
                lat_2=_proj4_num(s, "lat_2"),
                k_0=_proj4_num(s, "k") or _proj4_num(s, "k_0"),
                x_0=_proj4_num(s, "x_0") or 0.0,
                y_0=_proj4_num(s, "y_0") or 0.0,
            )
        if re.search(r"\+proj\s*=\s*sinu\b", s):
            flat = s.replace(" ", "")
            if "+R=6371007.181" in flat or "+a=6371007.181" in flat:
                return 6974  # MODIS sinusoidal grid (SR-ORG:6974)
            if "+R=6371000" in flat or (
                "R=" not in flat and "a=" not in flat
            ):
                return 53008
            raise CRSError(f"unrecognized sinusoidal sphere: {s!r}")
        if re.search(r"\+proj\s*=\s*moll\b", s):
            flat = s.replace(" ", "")
            if "+R=6371000" in flat or (
                "R=" not in flat and "a=" not in flat
            ):
                return 53009
            raise CRSError(f"unrecognized Mollweide sphere: {s!r}")
        if re.search(r"\+proj\s*=\s*eqc\b", s):
            ts = _proj4_num(s, "lat_ts")
            if ts not in (None, 0.0):
                raise CRSError(
                    f"equirectangular with lat_ts != 0 not registered: {s!r}"
                )
            flat = s.replace(" ", "")
            if "+R=6378137" in flat or "+a=6378137" in flat or (
                "R=" not in flat and "a=" not in flat
            ):
                return 32662
            raise CRSError(f"unrecognized equirectangular sphere: {s!r}")
        raise CRSError(f"unrecognized proj4 spec: {s!r}")
    raise CRSError(f"unsupported CRS spec: {text!r}")


def _proj4_num(spec: str, key: str) -> float | None:
    m = re.search(rf"\+{key}\s*=\s*(-?\d+(?:\.\d+)?)", spec)
    return float(m.group(1)) if m else None


def _require_wgs84_proj4(spec: str) -> None:
    """Parameter-driven construction runs on the WGS84/GRS80 ellipsoid
    (sub-mm identical); any OTHER stated datum/ellipsoid must raise rather
    than be silently reprojected wrong."""
    if re.search(
        r"(?i)\+(datum|ellps)\s*=\s*(?!WGS84\b|GRS80\b|ETRS89\b|NAD83\b)\w",
        spec,
    ):
        raise CRSError(f"non-WGS84/GRS80 ellipsoid in proj4 spec: {spec!r}")


def _proj4_ellps_token(spec: str) -> str:
    """'wgs84' (WGS84/GRS80/ETRS89/NAD83 or unstated), or the lowercased
    stated ellipsoid/datum name otherwise."""
    m = re.search(r"(?i)\+(?:ellps|datum)\s*=\s*(\w+)", spec)
    if m is None:
        return "wgs84"
    tok = m.group(1).lower()
    return "wgs84" if tok in ("wgs84", "grs80", "etrs89", "nad83") else tok


def _proj4_match_registered(spec: str) -> int | None:
    """Resolve a +proj=lcc/aea/laea/tmerc spec to a registered SRID by
    matching its numeric parameters against the built-in grid tables — the
    same families the closed-form kernels implement.  Ellipsoid-aware: a
    non-WGS84-family spec only matches a TM grid that carries that same
    ellipsoid (e.g. airy -> 27700).  Returns None when no registered grid
    matches (callers construct via crs_from_parameters, which re-checks
    the ellipsoid and raises for non-WGS84 families)."""
    fam = re.search(r"\+proj\s*=\s*(\w+)", spec).group(1)
    ellps = _proj4_ellps_token(spec)
    lat0 = _proj4_num(spec, "lat_0") or 0.0
    lon0 = _proj4_num(spec, "lon_0") or 0.0
    fe = _proj4_num(spec, "x_0") or 0.0
    fn = _proj4_num(spec, "y_0") or 0.0
    if fam == "laea":
        if ellps != "wgs84":
            return None
        for srid, (p0, l0, e0, n0) in _LAEA_PARAMS.items():
            if (lat0, lon0, fe, fn) == (p0, l0, e0, n0):
                return srid
        return None
    if fam in ("lcc", "aea"):
        if ellps != "wgs84":
            return None
        lat1 = _proj4_num(spec, "lat_1")
        lat2 = _proj4_num(spec, "lat_2")
        table = _LCC_PARAMS if fam == "lcc" else _AEA_PARAMS
        for srid, (p1, p2, p0, l0, e0, n0) in table.items():
            if (lat1, lat2) == (p1, p2) and (lat0, lon0) == (p0, l0) and (
                fe, fn
            ) == (e0, n0):
                return srid
        return None
    k0 = _proj4_num(spec, "k") or _proj4_num(spec, "k_0") or 1.0
    for srid, (grid_ellps, p0, l0, kk, e0, n0, _helm) in _TM_GRIDS.items():
        grid_tok = (
            "wgs84" if grid_ellps.lower() in ("wgs84", "grs80") else
            grid_ellps.lower()
        )
        if ellps == grid_tok and (lat0, lon0, k0, fe, fn) == (
            p0, l0, kk, e0, n0
        ):
            return srid
    return None


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
    # wrap to [-180, 180) like PROJ: x past the world extent re-enters on
    # the other side (geodesic.py re-unwraps per edge where continuity
    # matters)
    lon = (np.degrees(x / WGS84_A) + 180.0) % 360.0 - 180.0
    lat = np.degrees(2 * np.arctan(np.exp(y / WGS84_A)) - np.pi / 2)
    return lon, lat


register_transform(4326, 3857, _lonlat_to_webmercator)
register_transform(3857, 4326, _webmercator_to_lonlat)


# --------------------------------------------------- Transverse Mercator (C6)
# Closed-form UTM on the WGS84 ellipsoid: Krüger series in the third
# flattening n to order n⁶ (Karney 2011, "Transverse Mercator with an
# accuracy of a few nanometers" — truncation error < 10 nm inside a UTM
# zone, i.e. exact at double precision for all practical purposes).
# Mirrors the reference's PROJ-backed arbitrary-CRS support
# (internal/utils/proj/proj.go:47-73) for the EPSG:326xx/327xx family the
# reference's MGRS/customgrid tiling actually uses.

_WGS84_F = 1.0 / 298.257223563
_TM_N = _WGS84_F / (2.0 - _WGS84_F)  # third flattening
_TM_E = math.sqrt(_WGS84_F * (2.0 - _WGS84_F))  # first eccentricity
_TM_E2M = 1.0 - _TM_E * _TM_E
_TM_K0 = 0.9996
# rectifying radius A = a/(1+n)·(1 + n²/4 + n⁴/64 + n⁶/256)
_TM_A1 = (
    WGS84_A
    / (1.0 + _TM_N)
    * (1.0 + _TM_N**2 / 4.0 + _TM_N**4 / 64.0 + _TM_N**6 / 256.0)
)
def _kruger_alpha(_n: float) -> tuple[float, ...]:
    """Order-n⁶ Krüger forward-series coefficients (Karney 2011, eq 35)."""
    return (
        _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
        - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
        13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630
        - 1983433 * _n**6 / 1935360,
        61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
        + 167603 * _n**6 / 181440,
        49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
        34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
        212378941 * _n**6 / 319334400,
    )


def _kruger_beta(_n: float) -> tuple[float, ...]:
    """Order-n⁶ Krüger inverse-series coefficients (Karney 2011, eq 36)."""
    return (
        _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
        - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
        _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
        - 1118711 * _n**6 / 3870720,
        17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
        + 5569 * _n**6 / 90720,
        4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
        4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
        20648693 * _n**6 / 638668800,
    )


_TM_ALPHA = _kruger_alpha(_TM_N)
_TM_BETA = _kruger_beta(_TM_N)

_UTM_E0 = 500000.0
_UTM_N0_SOUTH = 10000000.0


def utm_zone_params(srid: int) -> tuple[float, float] | None:
    """(central meridian degrees, false northing) for EPSG:326xx/327xx."""
    if 32601 <= srid <= 32660:
        return float((srid - 32600) * 6 - 183), 0.0
    if 32701 <= srid <= 32760:
        return float((srid - 32700) * 6 - 183), _UTM_N0_SOUTH
    return None


def tm_forward(lon, lat, lon0_deg: float, false_northing: float = 0.0):
    """(lon, lat) degrees -> (easting, northing) meters, k0 = 0.9996.

    Conformal latitude via the CLOSED sinh/atanh form, then the order-n⁶
    Krüger series.  The same operation sequence is emitted as SQL by
    ``tm_forward_sql_columns`` so a DuckDB oracle reproduces these values
    to libm-ulp precision."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    t = np.sinh(
        np.arcsinh(np.tan(phi)) - _TM_E * np.arctanh(_TM_E * np.sin(phi))
    )
    cl = np.cos(lam)
    xip = np.arctan2(t, cl)
    etap = np.arcsinh(np.sin(lam) / np.sqrt(t * t + cl * cl))
    xi = xip.copy()
    eta = etap.copy()
    for j, a in enumerate(_TM_ALPHA, start=1):
        xi = xi + a * np.sin(2 * j * xip) * np.cosh(2 * j * etap)
        eta = eta + a * np.cos(2 * j * xip) * np.sinh(2 * j * etap)
    return (
        _UTM_E0 + _TM_K0 * _TM_A1 * eta,
        false_northing + _TM_K0 * _TM_A1 * xi,
    )


def _tau_from_taup(taup: np.ndarray) -> np.ndarray:
    """tan(phi) from tan(conformal phi) — GeographicLib's tauf Newton
    iteration on the closed-form forward (quadratic convergence; 3
    iterations reach double precision for |phi| < 89.99°)."""
    tau = taup / _TM_E2M
    for _ in range(5):
        sphi = tau / np.sqrt(1.0 + tau * tau)
        taup_i = np.sinh(np.arcsinh(tau) - _TM_E * np.arctanh(_TM_E * sphi))
        tau = tau + (taup - taup_i) * (1.0 + _TM_E2M * tau * tau) / (
            _TM_E2M * np.sqrt(1.0 + tau * tau) * np.sqrt(1.0 + taup_i * taup_i)
        )
    return tau


def tm_inverse(easting, northing, lon0_deg: float, false_northing: float = 0.0):
    """(easting, northing) meters -> (lon, lat) degrees (order-n⁶ inverse
    Krüger series + Newton for the conformal-to-geographic latitude)."""
    xi = (np.asarray(northing, dtype=np.float64) - false_northing) / (
        _TM_K0 * _TM_A1
    )
    eta = (np.asarray(easting, dtype=np.float64) - _UTM_E0) / (_TM_K0 * _TM_A1)
    xip = xi.copy()
    etap = eta.copy()
    for j, b in enumerate(_TM_BETA, start=1):
        xip = xip - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        etap = etap - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    se = np.sinh(etap)
    cx = np.cos(xip)
    taup = np.sin(xip) / np.sqrt(se * se + cx * cx)
    lam = np.arctan2(se, cx)
    phi = np.arctan(_tau_from_taup(taup))
    # wrap to [-180, 180) like PROJ — zones near the dateline otherwise
    # return continuous lons past ±180 (consumers that need continuity
    # re-unwrap per edge, e.g. functions/geodesic.py)
    lon = (np.degrees(lam) + lon0_deg + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


def tm_forward_sql_columns(lon_expr: str, lat_expr: str, srid: int) -> str:
    """DuckDB SELECT-list fragment computing ``utm_e``/``utm_n`` from
    lon/lat expressions — the SAME operation sequence as ``tm_forward``
    (DuckDB lateral alias reuse keeps it one SELECT).  Lets an oracle
    re-derive a UTM warp analytically, like the WebMercator twin."""
    cm, n0 = utm_zone_params(srid)
    e = repr(_TM_E)

    # DuckDB 1.0 has no sinh/cosh/asinh/atanh — spell them via exp/ln
    def _sinh(x: str) -> str:
        return f"(exp({x}) - exp(-({x}))) / 2"

    def _cosh(x: str) -> str:
        return f"(exp({x}) + exp(-({x}))) / 2"

    def _asinh(x: str) -> str:
        return f"ln(({x}) + sqrt(({x})*({x}) + 1))"

    def _atanh(x: str) -> str:
        return f"0.5 * ln((1 + ({x})) / (1 - ({x})))"

    terms_xi = " + ".join(
        f"{a!r} * sin({2 * j} * xip) * {_cosh(f'{2 * j} * etap')}"
        for j, a in enumerate(_TM_ALPHA, start=1)
    )
    terms_eta = " + ".join(
        f"{a!r} * cos({2 * j} * xip) * {_sinh(f'{2 * j} * etap')}"
        for j, a in enumerate(_TM_ALPHA, start=1)
    )
    k0a = repr(_TM_K0 * _TM_A1)
    return f"""
        radians(({lon_expr}) - {cm!r}) AS lam,
        radians({lat_expr}) AS phi,
        {_sinh(f"{_asinh('tan(phi)')} - {e} * {_atanh(f'{e} * sin(phi)')}")} AS tt,
        atan2(tt, cos(lam)) AS xip,
        {_asinh('sin(lam) / sqrt(tt * tt + cos(lam) * cos(lam))')} AS etap,
        {_UTM_E0!r} + {k0a} * (etap + {terms_eta}) AS utm_e,
        {n0!r} + {k0a} * (xip + {terms_xi}) AS utm_n"""


# ------------------------------------------------- polar stereographic (C6)
# Closed-form ellipsoidal polar stereographic (Snyder 1987, eqs 21-33..
# 21-41; exact, no series truncation): the polar-science CRS family —
# EPSG:3031 (Antarctic Polar Stereographic, lat_ts -71), EPSG:3413 (NSIDC
# Arctic, lat_ts 70, lon0 -45), EPSG:5041/5042 (UPS north/south,
# k0 = 0.994, FE = FN = 2 000 000).  Landsat/MODIS/Sentinel polar products
# ship in these; PROJ handles them for the reference (proj.go:47-73).

# srid -> (south?, lat_ts deg or None, k0 or None, lon0 deg, FE, FN)
_PS_PARAMS: dict[int, tuple[bool, float | None, float | None, float, float, float]] = {
    3031: (True, -71.0, None, 0.0, 0.0, 0.0),
    3413: (False, 70.0, None, -45.0, 0.0, 0.0),
    5041: (False, None, 0.994, 0.0, 2000000.0, 2000000.0),
    5042: (True, None, 0.994, 0.0, 2000000.0, 2000000.0),
}


def _ps_rho_factor(lat_ts: float | None, k0: float | None) -> float:
    """ρ = factor · t.  With a standard parallel: factor = a·m_c/t_c
    (true scale at lat_ts); with k0: factor = 2·a·k0 / √((1+e)^(1+e)·
    (1−e)^(1−e)) (scale k0 at the pole)."""
    e = _TM_E
    if lat_ts is not None:
        pc = math.radians(abs(lat_ts))
        sp = math.sin(pc)
        m_c = math.cos(pc) / math.sqrt(1.0 - e * e * sp * sp)
        t_c = math.tan(math.pi / 4.0 - pc / 2.0) * (
            (1.0 + e * sp) / (1.0 - e * sp)
        ) ** (e / 2.0)
        return WGS84_A * m_c / t_c
    return (
        2.0
        * WGS84_A
        * float(k0)
        / math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
    )


def ps_forward(lon, lat, srid: int):
    """(lon, lat) degrees -> polar stereographic (easting, northing) meters.

    North aspect (Snyder 21-33/34): t = tan(π/4 − φ/2)·[(1+e·sinφ)/
    (1−e·sinφ)]^(e/2), x = ρ·sin(λ−λ0), y = −ρ·cos(λ−λ0).  South aspect
    (Snyder 21-41): t from −φ, x = ρ·sin(λ−λ0), y = +ρ·cos(λ−λ0) — λ is
    NOT mirrored; only the northing axis flips, which keeps east positive
    along (λ0+90°) in both aspects (the EPSG:3031 axis convention)."""
    south, lat_ts, k0, lon0, fe, fn = _PS_PARAMS[srid]
    e = _TM_E
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    if south:
        phi = -phi
    sp = np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) * ((1.0 + e * sp) / (1.0 - e * sp)) ** (
        e / 2.0
    )
    rho = _ps_rho_factor(lat_ts, k0) * t
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)
    if south:
        y = -y
    return fe + x, fn + y


def ps_inverse(easting, northing, srid: int):
    """Polar stereographic meters -> (lon, lat) degrees.  φ from t by the
    standard fixed-point iteration (Snyder 7-9; appended Newton-free form
    converges to double precision in <6 iterations below 89.999°)."""
    south, lat_ts, k0, lon0, fe, fn = _PS_PARAMS[srid]
    e = _TM_E
    x = np.asarray(easting, dtype=np.float64) - fe
    y = np.asarray(northing, dtype=np.float64) - fn
    if south:
        y = -y
    rho = np.hypot(x, y)
    t = rho / _ps_rho_factor(lat_ts, k0)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        sp = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0)
        )
    lam = np.where(rho == 0.0, 0.0, np.arctan2(x, -y))
    if south:
        phi = -phi
    lon = (np.degrees(lam) + lon0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


def ps_forward_sql_columns(lon_expr: str, lat_expr: str, srid: int) -> str:
    """DuckDB SELECT-list fragment computing ``ps_e``/``ps_n`` with the SAME
    operation sequence as ``ps_forward`` — the analytic oracle twin, like
    ``tm_forward_sql_columns`` for UTM."""
    south, lat_ts, k0, lon0, fe, fn = _PS_PARAMS[srid]
    e = repr(_TM_E)
    sgn = "-" if south else ""  # south aspect: t from -phi, lam unchanged
    ysgn = "-" if not south else ""  # north: y = -rho*cos(lam); south: +
    return f"""
        radians(({lon_expr}) - {lon0!r}) AS ps_lam,
        {sgn}radians({lat_expr}) AS ps_phi,
        tan(pi() / 4 - ps_phi / 2)
          * pow((1 + {e} * sin(ps_phi)) / (1 - {e} * sin(ps_phi)), {e} / 2)
          AS ps_t,
        {_ps_rho_factor(lat_ts, k0)!r} * ps_t AS ps_rho,
        {fe!r} + ps_rho * sin(ps_lam) AS ps_e,
        {fn!r} + {ysgn}(ps_rho * cos(ps_lam)) AS ps_n"""


# ------------------------------------------------- Lambert Conformal Conic
#
# Snyder, "Map Projections — A Working Manual", eqs 15-1..15-11 (ellipsoidal
# 2-standard-parallel form): the most common remaining projection family in
# national products (France Lambert-93, Canada Atlas Lambert, CONUS LCC).
# The reference accepts these via PROJ (internal/utils/proj/proj.go:47-73);
# here they are closed-form like the UTM/polar families above.

_LCC_PARAMS: dict[int, tuple[float, float, float, float, float, float]] = {
    # srid: (lat1, lat2, lat0, lon0, false_easting, false_northing)
    2154: (49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0),  # RGF93 / Lambert-93
    3978: (49.0, 77.0, 49.0, -95.0, 0.0, 0.0),  # NAD83 / Canada Atlas Lambert
    102004: (33.0, 45.0, 39.0, -96.0, 0.0, 0.0),  # USA Contiguous LCC (ESRI)
}


def _lcc_constants(srid: int) -> tuple[float, float, float, float, float, float]:
    """(n, aF, rho0, lon0, fe, fn) — the per-CRS scalars of Snyder 15-3/
    15-7/15-7a, computed once driver-side and shared verbatim by the numpy
    kernel and the SQL oracle twin."""
    lat1, lat2, lat0, lon0, fe, fn = _LCC_PARAMS[srid]
    e = _TM_E

    def m(phi_deg: float) -> float:
        p = math.radians(phi_deg)
        sp = math.sin(p)
        return math.cos(p) / math.sqrt(1.0 - e * e * sp * sp)

    def t(phi_deg: float) -> float:
        p = math.radians(phi_deg)
        sp = math.sin(p)
        return math.tan(math.pi / 4.0 - p / 2.0) * (
            (1.0 + e * sp) / (1.0 - e * sp)
        ) ** (e / 2.0)

    m1, m2 = m(lat1), m(lat2)
    t1, t2 = t(lat1), t(lat2)
    n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    if n <= 0.0:
        raise CRSError(f"LCC srid {srid}: cone constant n must be > 0")
    aF = WGS84_A * m1 / (n * t1**n)
    rho0 = aF * t(lat0) ** n
    return n, aF, rho0, lon0, fe, fn


def lcc_forward(lon, lat, srid: int):
    """(lon, lat) degrees -> LCC (easting, northing) meters (Snyder
    15-1/15-2: x = ρ·sin θ, y = ρ0 − ρ·cos θ, θ = n·(λ−λ0), ρ = a·F·tⁿ)."""
    n, aF, rho0, lon0, fe, fn = _lcc_constants(srid)
    e = _TM_E
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = n * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    sp = np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) * ((1.0 + e * sp) / (1.0 - e * sp)) ** (
        e / 2.0
    )
    rho = aF * t**n
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def lcc_inverse(easting, northing, srid: int):
    """LCC meters -> (lon, lat) degrees (Snyder 15-8..15-11 with the same
    t->phi fixed-point iteration as the polar-stereo inverse)."""
    n, aF, rho0, lon0, fe, fn = _lcc_constants(srid)
    e = _TM_E
    x = np.asarray(easting, dtype=np.float64) - fe
    y = rho0 - (np.asarray(northing, dtype=np.float64) - fn)
    rho = np.hypot(x, y)  # n > 0 for all registered CRSs
    theta = np.arctan2(x, y)
    t = (rho / aF) ** (1.0 / n)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        sp = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0)
        )
    lon = (np.degrees(theta / n) + lon0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


def lcc_forward_sql_columns(lon_expr: str, lat_expr: str, srid: int) -> str:
    """DuckDB SELECT-list fragment computing ``lcc_e``/``lcc_n`` with the
    SAME operation sequence as ``lcc_forward`` — the analytic oracle twin
    of the UTM/polar fragments."""
    n, aF, rho0, lon0, fe, fn = _lcc_constants(srid)
    e = repr(_TM_E)
    return f"""
        radians({lat_expr}) AS lcc_phi,
        {n!r} * radians(({lon_expr}) - {lon0!r}) AS lcc_theta,
        tan(pi() / 4 - lcc_phi / 2)
          * pow((1 + {e} * sin(lcc_phi)) / (1 - {e} * sin(lcc_phi)), {e} / 2)
          AS lcc_t,
        {aF!r} * pow(lcc_t, {n!r}) AS lcc_rho,
        {fe!r} + lcc_rho * sin(lcc_theta) AS lcc_e,
        {fn!r} + {rho0!r} - lcc_rho * cos(lcc_theta) AS lcc_n"""


# --------------------------------------------------- Albers Equal Area conic
#
# Snyder eqs 14-1..14-21 (ellipsoidal, 2 standard parallels): the equal-area
# national grids (CONUS EPSG:5070, Australian Albers EPSG:3577, ESRI
# 102003).  Same closed-form + SQL-twin pattern as the conformal families.

_AEA_PARAMS: dict[int, tuple[float, float, float, float, float, float]] = {
    # srid: (lat1, lat2, lat0, lon0, false_easting, false_northing)
    5070: (29.5, 45.5, 23.0, -96.0, 0.0, 0.0),  # NAD83 / Conus Albers
    3577: (-18.0, -36.0, 0.0, 132.0, 0.0, 0.0),  # GDA94 / Australian Albers
    102003: (29.5, 45.5, 37.5, -96.0, 0.0, 0.0),  # USA Contiguous Albers (ESRI)
}


def _aea_q_scalar(phi: float) -> float:
    e = _TM_E
    sp = math.sin(phi)
    return (1.0 - e * e) * (
        sp / (1.0 - e * e * sp * sp)
        - (1.0 / (2.0 * e)) * math.log((1.0 - e * sp) / (1.0 + e * sp))
    )


def _aea_constants(srid: int) -> tuple[float, float, float, float, float, float]:
    """(n, C, rho0, lon0, fe, fn) — Snyder 14-14/14-13/14-12a."""
    lat1, lat2, lat0, lon0, fe, fn = _AEA_PARAMS[srid]
    e = _TM_E

    def m(phi_deg: float) -> float:
        p = math.radians(phi_deg)
        sp = math.sin(p)
        return math.cos(p) / math.sqrt(1.0 - e * e * sp * sp)

    m1, m2 = m(lat1), m(lat2)
    q1 = _aea_q_scalar(math.radians(lat1))
    q2 = _aea_q_scalar(math.radians(lat2))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    q0 = _aea_q_scalar(math.radians(lat0))
    rho0 = WGS84_A * math.sqrt(C - n * q0) / n
    return n, C, rho0, lon0, fe, fn


def aea_forward(lon, lat, srid: int):
    """(lon, lat) degrees -> Albers (easting, northing) meters (Snyder
    14-1..14-4: θ = n(λ−λ0), ρ = a√(C−nq)/n, x = ρ sinθ, y = ρ0 − ρ cosθ).
    Works for both hemispheres (n carries the sign)."""
    n, C, rho0, lon0, fe, fn = _aea_constants(srid)
    e = _TM_E
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = n * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    sp = np.sin(phi)
    q = (1.0 - e * e) * (
        sp / (1.0 - e * e * sp * sp)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * sp) / (1.0 + e * sp))
    )
    rho = WGS84_A * np.sqrt(C - n * q) / n
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def aea_inverse(easting, northing, srid: int):
    """Albers meters -> (lon, lat) degrees; φ from q by Snyder 3-16 Newton
    iteration (converges to double precision in < 6 steps)."""
    n, C, rho0, lon0, fe, fn = _aea_constants(srid)
    e = _TM_E
    x = np.asarray(easting, dtype=np.float64) - fe
    y = rho0 - (np.asarray(northing, dtype=np.float64) - fn)
    rho = np.hypot(x, y)
    # southern cone (n < 0): only theta needs the sign treatment — rho
    # enters q strictly squared, so its sign is immaterial
    theta = np.arctan2(-x, -y) if n < 0.0 else np.arctan2(x, y)
    q = (C - (rho * n / WGS84_A) ** 2) / n
    # initial guess: authalic sphere
    qp = _aea_q_scalar(math.pi / 2.0)
    phi = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    for _ in range(8):
        sp = np.sin(phi)
        one = 1.0 - e * e * sp * sp
        phi = phi + (one * one) / (2.0 * np.cos(phi)) * (
            q / (1.0 - e * e)
            - sp / one
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * sp) / (1.0 + e * sp))
        )
    lon = (np.degrees(theta / n) + lon0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


def aea_forward_sql_columns(lon_expr: str, lat_expr: str, srid: int) -> str:
    """DuckDB fragment computing ``aea_e``/``aea_n`` with the numpy
    kernel's exact operation sequence (the oracle twin; n > 0 CRSs)."""
    n, C, rho0, lon0, fe, fn = _aea_constants(srid)
    e = repr(_TM_E)
    return f"""
        sin(radians({lat_expr})) AS aea_sp,
        {n!r} * radians(({lon_expr}) - {lon0!r}) AS aea_theta,
        (1 - {e}*{e}) * (aea_sp / (1 - {e}*{e}*aea_sp*aea_sp)
            - (1.0/(2*{e})) * ln((1 - {e}*aea_sp) / (1 + {e}*aea_sp)))
          AS aea_q,
        {WGS84_A!r} * sqrt({C!r} - {n!r} * aea_q) / {n!r} AS aea_rho,
        {fe!r} + aea_rho * sin(aea_theta) AS aea_e,
        {fn!r} + {rho0!r} - aea_rho * cos(aea_theta) AS aea_n"""


# ------------------------------------ Lambert Azimuthal Equal-Area (oblique)
#
# Snyder eqs 24-2..24-31 / 24-56..24-59 (ellipsoidal, oblique aspect via the
# authalic sphere): the pan-European statistical grid EPSG:3035 (ETRS89 /
# LAEA Europe) and any custom LAEA built by crs_from_parameters.  ETRS89
# rides the GRS80 ellipsoid, which this kernel approximates with WGS84 —
# the flattenings differ in the 11th significant digit (sub-0.1 mm), the
# same convention the NAD83 LCC/AEA grids above already use.

_LAEA_PARAMS: dict[int, tuple[float, float, float, float]] = {
    # srid: (lat0, lon0, false_easting, false_northing)
    3035: (52.0, 10.0, 4321000.0, 3210000.0),  # ETRS89-extended / LAEA Europe
}


def _laea_constants(srid: int) -> tuple[float, ...]:
    """(sin_b1, cos_b1, Rq, D, qp, lon0, fe, fn) — Snyder 3-11/3-12,
    24-20 (Rq), 24-24 (D), computed once driver-side and shared verbatim
    by the numpy kernel and the SQL oracle twin."""
    lat0, lon0, fe, fn = _LAEA_PARAMS[srid]
    e = _TM_E
    qp = _aea_q_scalar(math.pi / 2.0)
    q1 = _aea_q_scalar(math.radians(lat0))
    b1 = math.asin(q1 / qp)
    Rq = WGS84_A * math.sqrt(qp / 2.0)
    sp = math.sin(math.radians(lat0))
    m1 = math.cos(math.radians(lat0)) / math.sqrt(1.0 - e * e * sp * sp)
    D = WGS84_A * m1 / (Rq * math.cos(b1))
    return math.sin(b1), math.cos(b1), Rq, D, qp, lon0, fe, fn


def laea_forward(lon, lat, srid: int):
    """(lon, lat) degrees -> LAEA (easting, northing) meters (Snyder
    24-30/24-31: x = B·D·cosβ·sin(λ−λ0), y = (B/D)·(cosβ1·sinβ −
    sinβ1·cosβ·cos(λ−λ0)), B = Rq·√(2/(1+sinβ1·sinβ+cosβ1·cosβ·cosΔλ)))."""
    sin_b1, cos_b1, Rq, D, qp, lon0, fe, fn = _laea_constants(srid)
    e = _TM_E
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    sp = np.sin(phi)
    q = (1.0 - e * e) * (
        sp / (1.0 - e * e * sp * sp)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * sp) / (1.0 + e * sp))
    )
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    sb, cb = np.sin(beta), np.cos(beta)
    B = Rq * np.sqrt(
        2.0 / (1.0 + sin_b1 * sb + cos_b1 * cb * np.cos(dlam))
    )
    x = fe + B * D * cb * np.sin(dlam)
    y = fn + (B / D) * (cos_b1 * sb - sin_b1 * cb * np.cos(dlam))
    return x, y


def laea_inverse(easting, northing, srid: int):
    """LAEA meters -> (lon, lat) degrees (Snyder 24-56..24-59: angular
    distance ce from ρ, authalic q back out, then the same Snyder 3-16
    Newton iteration as the Albers inverse)."""
    sin_b1, cos_b1, Rq, D, qp, lon0, fe, fn = _laea_constants(srid)
    e = _TM_E
    xp = (np.asarray(easting, dtype=np.float64) - fe) / D
    yp = (np.asarray(northing, dtype=np.float64) - fn) * D
    rho = np.hypot(xp, yp)
    at_center = rho == 0.0
    rho_safe = np.where(at_center, 1.0, rho)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * Rq), -1.0, 1.0))
    q = qp * (
        np.cos(ce) * sin_b1 + yp * np.sin(ce) * cos_b1 / rho_safe
    )
    q = np.where(at_center, qp * sin_b1, q)
    lam = np.arctan2(
        xp * np.sin(ce),
        rho_safe * cos_b1 * np.cos(ce) - yp * sin_b1 * np.sin(ce),
    )
    lam = np.where(at_center, 0.0, lam)
    phi = np.arcsin(np.clip(q / qp, -1.0, 1.0))  # authalic first guess
    for _ in range(8):
        sp = np.sin(phi)
        one = 1.0 - e * e * sp * sp
        phi = phi + (one * one) / (2.0 * np.cos(phi)) * (
            q / (1.0 - e * e)
            - sp / one
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * sp) / (1.0 + e * sp))
        )
    lon = (np.degrees(lam) + lon0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


def laea_forward_sql_columns(lon_expr: str, lat_expr: str, srid: int) -> str:
    """DuckDB fragment computing ``laea_e``/``laea_n`` with the numpy
    kernel's exact operation sequence (the oracle twin, same pattern as
    the UTM/polar/LCC/AEA fragments)."""
    sin_b1, cos_b1, Rq, D, qp, lon0, fe, fn = _laea_constants(srid)
    e = repr(_TM_E)
    return f"""
        sin(radians({lat_expr})) AS laea_sp,
        radians(({lon_expr}) - {lon0!r}) AS laea_dlam,
        (1 - {e}*{e}) * (laea_sp / (1 - {e}*{e}*laea_sp*laea_sp)
            - (1.0/(2*{e})) * ln((1 - {e}*laea_sp) / (1 + {e}*laea_sp)))
          AS laea_q,
        asin(greatest(-1.0, least(1.0, laea_q / {qp!r}))) AS laea_beta,
        {Rq!r} * sqrt(2.0 / (1 + {sin_b1!r} * sin(laea_beta)
            + {cos_b1!r} * cos(laea_beta) * cos(laea_dlam))) AS laea_B,
        {fe!r} + laea_B * {D!r} * cos(laea_beta) * sin(laea_dlam) AS laea_e,
        {fn!r} + (laea_B / {D!r}) * ({cos_b1!r} * sin(laea_beta)
            - {sin_b1!r} * cos(laea_beta) * cos(laea_dlam)) AS laea_n"""


# ----------------------------------- parameter-driven CRS construction (C6)
#
# The reference accepts ANY projected CRS via PROJ
# (internal/utils/proj/proj.go:47-73).  With no pyproj in this container,
# the closed-form kernels above ARE the projection engine — what this block
# adds is the reference's "any parameter set" behavior for the families
# those kernels already implement: an unregistered LCC/AEA/LAEA/TM/polar-
# stereo parameter set (from proj4 or WKT) is CONSTRUCTED into the family
# table under a synthetic SRID instead of raising.  Identical parameter
# sets always resolve to the same SRID (the table is scanned before
# allocating), so plans built from equal specs share transforms.

_SYNTHETIC_SRID_BASE = 900900
_synthetic_srid_next = [_SYNTHETIC_SRID_BASE]


def _intern_params(table: dict[int, tuple], params: tuple) -> int:
    for srid, existing in table.items():
        if existing == params:
            return srid
    srid = _synthetic_srid_next[0]
    _synthetic_srid_next[0] += 1
    table[srid] = params
    return srid


def crs_from_parameters(
    family: str,
    *,
    lat_0: float = 0.0,
    lon_0: float = 0.0,
    lat_1: float | None = None,
    lat_2: float | None = None,
    lat_ts: float | None = None,
    k_0: float | None = None,
    x_0: float = 0.0,
    y_0: float = 0.0,
) -> int:
    """Construct (or look up) a CRS from raw projection parameters on the
    WGS84/GRS80 ellipsoid and return its SRID.  Families: ``lcc`` (2SP),
    ``aea`` (2SP), ``laea``, ``tmerc``, ``stere`` (polar only).  The
    returned SRID plugs into every kernel, transform resolver, and SQL
    oracle fragment exactly like a built-in EPSG code."""
    fam = family.lower()
    if fam == "lcc" or fam == "aea":
        if lat_1 is None or lat_2 is None:
            raise CRSError(
                f"{fam} needs both standard parallels (lat_1, lat_2)"
            )
        table = _LCC_PARAMS if fam == "lcc" else _AEA_PARAMS
        return _intern_params(
            table, (float(lat_1), float(lat_2), float(lat_0), float(lon_0),
                    float(x_0), float(y_0))
        )
    if fam == "laea":
        return _intern_params(
            _LAEA_PARAMS, (float(lat_0), float(lon_0), float(x_0), float(y_0))
        )
    if fam in ("tmerc", "tm"):
        return _intern_params(
            _TM_GRIDS,
            ("GRS80", float(lat_0), float(lon_0),
             float(1.0 if k_0 is None else k_0), float(x_0), float(y_0),
             None),
        )
    if fam == "stere":
        if lat_0 not in (90.0, -90.0):
            raise CRSError(
                f"stere supports the polar aspect only (lat_0=±90), "
                f"got lat_0={lat_0}"
            )
        if lat_ts is None and k_0 is None:
            k_0 = 1.0
        return _intern_params(
            _PS_PARAMS,
            (lat_0 == -90.0,
             None if lat_ts is None else float(lat_ts),
             None if k_0 is None else float(k_0),
             float(lon_0), float(x_0), float(y_0)),
        )
    raise CRSError(f"no parameter-driven constructor for +proj={family}")


_WKT_PROJ_FAMILIES = {
    "lambert_conformal_conic_2sp": "lcc",
    "lambert_conformal_conic": "lcc",
    "lambert_conic_conformal_2sp": "lcc",  # WKT2 EPSG method 9802 spelling
    "albers_conic_equal_area": "aea",
    "albers_equal_area": "aea",
    "lambert_azimuthal_equal_area": "laea",
    "transverse_mercator": "tmerc",
    "polar_stereographic": "stere",
    "polar_stereographic_variant_a": "stere",
    "polar_stereographic_variant_b": "stere",
}
_WKT_PARAM_ALIASES = {
    "latitude_of_origin": "lat_0",
    "latitude_of_center": "lat_0",
    "latitude_of_natural_origin": "lat_0",
    "latitude_of_false_origin": "lat_0",
    "latitude_of_standard_parallel": "lat_ts",
    "central_meridian": "lon_0",
    "longitude_of_center": "lon_0",
    "longitude_of_natural_origin": "lon_0",
    "longitude_of_false_origin": "lon_0",
    "longitude_of_origin": "lon_0",
    "standard_parallel_1": "lat_1",
    "standard_parallel_2": "lat_2",
    "latitude_of_1st_standard_parallel": "lat_1",
    "latitude_of_2nd_standard_parallel": "lat_2",
    "scale_factor": "k_0",
    "scale_factor_at_natural_origin": "k_0",
    "false_easting": "x_0",
    "false_northing": "y_0",
    "easting_at_false_origin": "x_0",
    "northing_at_false_origin": "y_0",
}
_WKT_WGS84_DATUMS = re.compile(
    r"(?i)wgs[ _]?(19)?84|grs[ _]?(19)?80|etrs[ _]?89|nad[ _]?83"
    r"|world[ _]?geodetic[ _]?system[ _]?(19)?84"
    r"|european[ _]?terrestrial[ _]?reference[ _]?system[ _]?(19)?89"
)


def _wkt_key(name: str) -> str:
    return re.sub(r"[\s()-]+", "_", name.strip().lower()).strip("_")


def _wkt_projcs_from_parameters(s: str) -> int | None:
    """Construct a PROJCS/PROJCRS that has no top-level EPSG authority from
    its PROJECTION/METHOD + PARAMETER clauses (WKT1 and WKT2 spellings).
    Returns None when the WKT carries no projection method; raises for a
    non-WGS84/GRS80 base datum or an unsupported method."""
    m = re.search(
        r'(?i)(?:PROJECTION|METHOD)\s*\[\s*"([^"]+)"', s
    )
    if m is None:
        return None
    method = _wkt_key(m.group(1))
    fam = _WKT_PROJ_FAMILIES.get(method)
    if fam is None:
        raise CRSError(f"unsupported WKT projection method: {m.group(1)!r}")
    # key the compatibility gate on the DATUM/SPHEROID clause NAMES only —
    # searching the whole WKT lets a non-WGS84 datum (e.g. Bessel 1841)
    # whose PROJCS name merely contains 'ETRS89'/'NAD83' pass and be
    # silently constructed on the wrong ellipsoid (~100 m errors); this
    # mirrors the proj4 path's keyed +datum/+ellps check.
    clause_names = [
        cm.group(1)
        for cm in re.finditer(
            r'(?i)\b(?:DATUM|GEODETICDATUM|TRF|SPHEROID|ELLIPSOID)'
            r'\s*\[\s*"([^"]+)"',
            s,
        )
    ]
    if not any(_WKT_WGS84_DATUMS.search(n) for n in clause_names):
        raise CRSError(
            "WKT base datum is not WGS84/GRS80-compatible; register a "
            "custom transform via register_transform() instead"
        )
    kwargs: dict[str, float] = {}
    for pm in re.finditer(
        r'(?i)PARAMETER\s*\[\s*"([^"]+)"\s*,\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)',
        s,
    ):
        key = _WKT_PARAM_ALIASES.get(_wkt_key(pm.group(1)))
        if key is not None:
            kwargs[key] = float(pm.group(2))
    if fam == "stere":
        # GDAL's common WKT1 Polar_Stereographic spelling (variant B)
        # carries the standard parallel as latitude_of_origin: a lat_0
        # with |lat| != 90 IS lat_ts, and the pole is inferred from its
        # hemisphere; likewise an explicit standard parallel without lat_0.
        lat0 = kwargs.get("lat_0")
        if lat0 is not None and abs(lat0) != 90.0:
            kwargs.setdefault("lat_ts", kwargs.pop("lat_0"))
            kwargs["lat_0"] = math.copysign(90.0, kwargs["lat_ts"])
        elif lat0 is None and kwargs.get("lat_ts") is not None:
            kwargs["lat_0"] = math.copysign(90.0, kwargs["lat_ts"])
    return crs_from_parameters(fam, **kwargs)


# ------------------------------------------- spherical world projections
#
# Sinusoidal (Snyder eq 30-1/30-2), Mollweide (Snyder 31-1..31-8) and
# Plate Carree / spherical equirectangular (EPSG method 9823) on a sphere —
# the formulas the MODIS land grid (SR-ORG:6974, R = 6371007.181 m), the
# ESRI world sphere grids (53008/53009) and EPSG:32662 actually use.
# Reference accepts these via PROJ (internal/utils/proj/proj.go:47-73).

_SINU_PARAMS: dict[int, float] = {
    # srid -> sphere radius (meters)
    6974: 6371007.181,  # SR-ORG:6974 — the MODIS sinusoidal land grid
    53008: 6371000.0,  # ESRI Sphere_Sinusoidal
}
_MOLL_PARAMS: dict[int, float] = {
    53009: 6371000.0,  # ESRI Sphere_Mollweide
}
_EQC_PARAMS: dict[int, float] = {
    32662: 6378137.0,  # WGS 84 / Plate Carree (spherical method, R = a)
}


def sinu_forward(lon, lat, srid: int):
    """(lon, lat) degrees -> sinusoidal (x, y) meters: x = R·λ·cosφ,
    y = R·φ (equal-area, pseudocylindrical)."""
    R = _SINU_PARAMS[srid]
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    return R * lam * np.cos(phi), R * phi


def sinu_inverse(x, y, srid: int):
    R = _SINU_PARAMS[srid]
    phi = np.asarray(y, dtype=np.float64) / R
    cphi = np.cos(phi)
    # at the exact pole every x maps to the pole point; keep lon finite
    lam = np.where(
        np.abs(cphi) < 1e-12, 0.0, np.asarray(x, dtype=np.float64) / (R * np.maximum(cphi, 1e-12))
    )
    return np.degrees(lam), np.degrees(phi)


def sinu_forward_sql_columns(lon_expr: str, lat_expr: str, srid: int) -> str:
    """DuckDB fragment computing ``sinu_x``/``sinu_y`` with the numpy
    kernel's exact operation sequence (oracle twin)."""
    R = repr(_SINU_PARAMS[srid])
    return f"""
        {R} * radians({lon_expr}) * cos(radians({lat_expr})) AS sinu_x,
        {R} * radians({lat_expr}) AS sinu_y"""


def moll_forward(lon, lat, srid: int):
    """Mollweide: solve 2θ + sin2θ = π·sinφ by Newton (Snyder 31-5), then
    x = (2√2/π)·R·λ·cosθ, y = √2·R·sinθ."""
    R = _MOLL_PARAMS[srid]
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    pi_sin = np.pi * np.sin(phi)
    theta = phi.copy()
    for _ in range(12):
        f = 2.0 * theta + np.sin(2.0 * theta) - pi_sin
        fp = 2.0 + 2.0 * np.cos(2.0 * theta)
        step = np.where(np.abs(fp) < 1e-12, 0.0, f / np.maximum(np.abs(fp), 1e-12) * np.sign(fp))
        theta = theta - step
    x = (2.0 * math.sqrt(2.0) / np.pi) * R * lam * np.cos(theta)
    y = math.sqrt(2.0) * R * np.sin(theta)
    return x, y


def moll_inverse(x, y, srid: int):
    R = _MOLL_PARAMS[srid]
    theta = np.arcsin(np.clip(np.asarray(y, dtype=np.float64) / (math.sqrt(2.0) * R), -1.0, 1.0))
    phi = np.arcsin(np.clip((2.0 * theta + np.sin(2.0 * theta)) / np.pi, -1.0, 1.0))
    ct = np.cos(theta)
    lam = np.where(
        np.abs(ct) < 1e-12,
        0.0,
        np.pi * np.asarray(x, dtype=np.float64)
        / (2.0 * math.sqrt(2.0) * R * np.maximum(ct, 1e-12)),
    )
    return np.degrees(lam), np.degrees(phi)


def eqc_forward(lon, lat, srid: int):
    """Plate Carree: x = R·λ, y = R·φ (EPSG method 9823, spherical)."""
    R = _EQC_PARAMS[srid]
    return (
        R * np.radians(np.asarray(lon, dtype=np.float64)),
        R * np.radians(np.asarray(lat, dtype=np.float64)),
    )


def eqc_inverse(x, y, srid: int):
    R = _EQC_PARAMS[srid]
    return (
        np.degrees(np.asarray(x, dtype=np.float64) / R),
        np.degrees(np.asarray(y, dtype=np.float64) / R),
    )


# ----------------------- national transverse Mercator grids + datum shifts
#
# Generalized Krüger TM on an arbitrary ellipsoid with arbitrary
# (lat0, lon0, k0, FE, FN), plus 7-parameter Helmert datum transforms
# (EPSG method 9606, position-vector convention) so grids on non-WGS84
# datums compose through the WGS84 lon/lat hub.  Covers the reference's
# arbitrary-CRS surface (internal/utils/proj/proj.go:47-73) for the
# classic national grid family; registered out of the box:
#   EPSG:27700 British National Grid (OSGB36 / Airy 1830, Helmert from
#     the OS "Guide to coordinate systems in Great Britain" — the single
#     7-param approximation, ~3 m vs OSTN15, same as PROJ's +towgs84)
#   EPSG:2193 NZ Transverse Mercator 2000 (NZGD2000 / GRS80, no shift)

_ELLIPSOIDS: dict[str, tuple[float, float]] = {
    # name -> (semi-major a, flattening f)
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "airy": (6377563.396, 1.0 / 299.3249646),
}

# srid -> (ellipsoid, lat0, lon0, k0, false_easting, false_northing,
#          helmert local->WGS84 (tx,ty,tz meters, rx,ry,rz arcsec, s ppm)
#          or None when the datum is WGS84-equivalent)
_TM_GRIDS: dict[int, tuple] = {
    27700: ("airy", 49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
            (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)),
    2193: ("GRS80", 0.0, 173.0, 0.9996, 1600000.0, 10000000.0, None),
}


def _tm_series(ellps: str) -> tuple[float, tuple, tuple, float, float]:
    """(A1, alpha, beta, e, e2m) for an ellipsoid — the Krüger machinery
    of the UTM kernel evaluated at this ellipsoid's third flattening."""
    a, f = _ELLIPSOIDS[ellps]
    n = f / (2.0 - f)
    e = math.sqrt(f * (2.0 - f))
    A1 = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0 + n**6 / 256.0)
    return A1, _kruger_alpha(n), _kruger_beta(n), e, 1.0 - e * e


def _tm_xi0(ellps: str, lat0_deg: float) -> float:
    """Rectifying-latitude series value at (lat0, lam=0) — the northing
    origin offset: N = FN + k0*A1*(xi - xi0)."""
    if lat0_deg == 0.0:
        return 0.0
    _A1, alpha, _beta, e, _e2m = _tm_series(ellps)
    phi = math.radians(lat0_deg)
    t = math.sinh(math.asinh(math.tan(phi)) - e * math.atanh(e * math.sin(phi)))
    xip = math.atan(t)
    xi = xip
    for j, a in enumerate(alpha, start=1):
        xi += a * math.sin(2 * j * xip)
    return xi


def tmgrid_forward(lon, lat, srid: int):
    """(lon, lat) degrees IN THE GRID'S OWN DATUM -> (E, N) meters."""
    ellps, lat0, lon0, k0, fe, fn, _ = _TM_GRIDS[srid]
    A1, alpha, _beta, e, _e2m = _tm_series(ellps)
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    t = np.sinh(np.arcsinh(np.tan(phi)) - e * np.arctanh(e * np.sin(phi)))
    cl = np.cos(lam)
    xip = np.arctan2(t, cl)
    etap = np.arcsinh(np.sin(lam) / np.sqrt(t * t + cl * cl))
    xi = xip.copy()
    eta = etap.copy()
    for j, a in enumerate(alpha, start=1):
        xi = xi + a * np.sin(2 * j * xip) * np.cosh(2 * j * etap)
        eta = eta + a * np.cos(2 * j * xip) * np.sinh(2 * j * etap)
    xi0 = _tm_xi0(ellps, lat0)
    return fe + k0 * A1 * eta, fn + k0 * A1 * (xi - xi0)


def tmgrid_inverse(easting, northing, srid: int):
    """(E, N) meters -> (lon, lat) degrees IN THE GRID'S OWN DATUM."""
    ellps, lat0, lon0, k0, fe, fn, _ = _TM_GRIDS[srid]
    A1, _alpha, beta, e, e2m = _tm_series(ellps)
    xi0 = _tm_xi0(ellps, lat0)
    xi = (np.asarray(northing, dtype=np.float64) - fn) / (k0 * A1) + xi0
    eta = (np.asarray(easting, dtype=np.float64) - fe) / (k0 * A1)
    xip = xi.copy()
    etap = eta.copy()
    for j, b in enumerate(beta, start=1):
        xip = xip - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        etap = etap - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    se = np.sinh(etap)
    cx = np.cos(xip)
    taup = np.sin(xip) / np.sqrt(se * se + cx * cx)
    lam = np.arctan2(se, cx)
    # tauf Newton on this ellipsoid (same scheme as _tau_from_taup)
    tau = taup / e2m
    for _ in range(5):
        sphi = tau / np.sqrt(1.0 + tau * tau)
        taup_i = np.sinh(np.arcsinh(tau) - e * np.arctanh(e * sphi))
        tau = tau + (taup - taup_i) * (1.0 + e2m * tau * tau) / (
            e2m * np.sqrt(1.0 + tau * tau) * np.sqrt(1.0 + taup_i * taup_i)
        )
    lon = (np.degrees(lam) + lon0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(np.arctan(tau))


def _geodetic_to_ecef(lon_deg, lat_deg, ellps: str):
    """Geodetic (h=0) -> geocentric cartesian meters on the ellipsoid."""
    a, f = _ELLIPSOIDS[ellps]
    e2 = f * (2.0 - f)
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    sp = np.sin(phi)
    nu = a / np.sqrt(1.0 - e2 * sp * sp)
    cp = np.cos(phi)
    return nu * cp * np.cos(lam), nu * cp * np.sin(lam), nu * (1.0 - e2) * sp


def _ecef_to_geodetic(X, Y, Z, ellps: str):
    """Geocentric cartesian -> geodetic lon/lat degrees (h discarded), by
    Bowring's formula (1976) plus ONE fixed-point refinement — closed
    form, so the SQL twin stays a flat expression (an unrolled iteration
    explodes exponentially under alias inlining).  For near-surface
    points the result is exact to < 1e-12 deg (pytest-checked against a
    fully-converged iteration)."""
    a, f = _ELLIPSOIDS[ellps]
    e2 = f * (2.0 - f)
    b = a * (1.0 - f)
    ep2 = e2 / (1.0 - e2)
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    Z = np.asarray(Z, dtype=np.float64)
    p = np.sqrt(X * X + Y * Y)
    theta = np.arctan2(Z * a, p * b)
    st, ct = np.sin(theta), np.cos(theta)
    phi = np.arctan2(Z + ep2 * b * st * st * st, p - e2 * a * ct * ct * ct)
    sp = np.sin(phi)
    nu = a / np.sqrt(1.0 - e2 * sp * sp)
    phi = np.arctan2(Z + e2 * nu * sp, p)
    return np.degrees(np.arctan2(Y, X)), np.degrees(phi)


def _helmert_to_wgs84(X, Y, Z, params):
    """Position-vector 7-param Helmert, local datum -> WGS84 (EPSG 9606):
    [X'] = T + (1+s)·R·[X], R the small-angle rotation matrix."""
    tx, ty, tz, rx_s, ry_s, rz_s, s_ppm = params
    rx, ry, rz = (math.radians(v / 3600.0) for v in (rx_s, ry_s, rz_s))
    m = 1.0 + s_ppm * 1e-6
    Xn = tx + m * (X - rz * Y + ry * Z)
    Yn = ty + m * (rz * X + Y - rx * Z)
    Zn = tz + m * (-ry * X + rx * Y + Z)
    return Xn, Yn, Zn


def _helmert_from_wgs84(X, Y, Z, params):
    """Exact inverse of ``_helmert_to_wgs84`` (transpose rotation after
    removing translation and scale — not the params-negated approximation,
    so forward∘inverse is identity to machine precision)."""
    tx, ty, tz, rx_s, ry_s, rz_s, s_ppm = params
    rx, ry, rz = (math.radians(v / 3600.0) for v in (rx_s, ry_s, rz_s))
    m = 1.0 + s_ppm * 1e-6
    # R is infinitesimal, not orthogonal: invert the exact linear system
    # R·v = u via Cramer (3x3), keeping bit-parity with the SQL twin
    ux, uy, uz = (X - tx) / m, (Y - ty) / m, (Z - tz) / m
    det = 1.0 + rx * rx + ry * ry + rz * rz
    vx = (ux * (1.0 + rx * rx) + uy * (rz + rx * ry) + uz * (rx * rz - ry)) / det
    vy = (ux * (rx * ry - rz) + uy * (1.0 + ry * ry) + uz * (rx + ry * rz)) / det
    vz = (ux * (ry + rx * rz) + uy * (ry * rz - rx) + uz * (1.0 + rz * rz)) / det
    return vx, vy, vz


def tmgrid_from_wgs84(lon, lat, srid: int):
    """WGS84 (lon, lat) -> grid (E, N): datum shift (if any) then TM."""
    params = _TM_GRIDS[srid][6]
    if params is None:
        return tmgrid_forward(lon, lat, srid)
    ellps = _TM_GRIDS[srid][0]
    X, Y, Z = _geodetic_to_ecef(lon, lat, "WGS84")
    Xl, Yl, Zl = _helmert_from_wgs84(X, Y, Z, params)
    lo, la = _ecef_to_geodetic(Xl, Yl, Zl, ellps)
    return tmgrid_forward(lo, la, srid)


def tmgrid_to_wgs84(easting, northing, srid: int):
    """Grid (E, N) -> WGS84 (lon, lat): TM inverse then datum shift."""
    params = _TM_GRIDS[srid][6]
    lo, la = tmgrid_inverse(easting, northing, srid)
    if params is None:
        return lo, la
    ellps = _TM_GRIDS[srid][0]
    X, Y, Z = _geodetic_to_ecef(lo, la, ellps)
    Xw, Yw, Zw = _helmert_to_wgs84(X, Y, Z, params)
    return _ecef_to_geodetic(Xw, Yw, Zw, "WGS84")


def tmgrid_from_wgs84_sql_ctes(
    srid: int,
    lon_expr: str,
    lat_expr: str,
    source: str,
    carry: tuple[str, ...] = ("obx", "oby"),
) -> str:
    """DuckDB CTE chain computing ``tmg_e``/``tmg_n`` from WGS84 lon/lat
    with the numpy chain's exact operation sequence: WGS84 ECEF ->
    inverse Helmert -> Bowring geodetic on the grid ellipsoid -> Krüger
    forward.  Emitted as FIVE chained CTEs (tmg_ecef/tmg_local/tmg_geo/
    tmg_conf/tmg_out) rather than one SELECT list: DuckDB inlines
    same-list alias references textually, so a deep chain in a single
    list explodes exponentially — each CTE boundary materializes its
    columns instead.  ``carry`` columns are forwarded through every
    stage; append ``, tmg_out AS the final relation`` usage downstream.
    """
    ellps, lat0, lon0, k0, fe, fn, params = _TM_GRIDS[srid]
    A1, alpha, _beta, e, _e2m = _tm_series(ellps)
    a_l, f_l = _ELLIPSOIDS[ellps]
    e2l = f_l * (2.0 - f_l)
    a_w, f_w = _ELLIPSOIDS["WGS84"]
    e2w = f_w * (2.0 - f_w)
    xi0 = _tm_xi0(ellps, lat0)
    cr = ", ".join(carry) + ", " if carry else ""

    def _sinh(x: str) -> str:
        return f"(exp({x}) - exp(-({x}))) / 2"

    def _cosh(x: str) -> str:
        return f"(exp({x}) + exp(-({x}))) / 2"

    def _asinh(x: str) -> str:
        return f"ln(({x}) + sqrt(({x})*({x}) + 1))"

    def _atanh(x: str) -> str:
        return f"0.5 * ln((1 + ({x})) / (1 - ({x})))"

    if params is not None:
        tx, ty, tz, rx_s, ry_s, rz_s, s_ppm = params
        rx, ry, rz = (math.radians(v / 3600.0) for v in (rx_s, ry_s, rz_s))
        m = 1.0 + s_ppm * 1e-6
        det = 1.0 + rx * rx + ry * ry + rz * rz
        local = f"""
        (h_ux * {1.0 + rx * rx!r} + h_uy * {rz + rx * ry!r}
           + h_uz * {rx * rz - ry!r}) / {det!r} AS l_x,
        (h_ux * {rx * ry - rz!r} + h_uy * {1.0 + ry * ry!r}
           + h_uz * {rx + ry * rz!r}) / {det!r} AS l_y,
        (h_ux * {ry + rx * rz!r} + h_uy * {ry * rz - rx!r}
           + h_uz * {1.0 + rz * rz!r}) / {det!r} AS l_z"""
        helm = f"""
        (g_x - {tx!r}) / {m!r} AS h_ux,
        (g_y - {ty!r}) / {m!r} AS h_uy,
        (g_z - {tz!r}) / {m!r} AS h_uz,{local}"""
    else:
        helm = """
        g_x AS l_x, g_y AS l_y, g_z AS l_z"""
    b_l = a_l * (1.0 - f_l)
    ep2l = e2l / (1.0 - e2l)
    terms_xi = " + ".join(
        f"{a!r} * sin({2 * j} * t_xip) * {_cosh(f'{2 * j} * t_etap')}"
        for j, a in enumerate(alpha, start=1)
    )
    terms_eta = " + ".join(
        f"{a!r} * cos({2 * j} * t_xip) * {_sinh(f'{2 * j} * t_etap')}"
        for j, a in enumerate(alpha, start=1)
    )
    k0a = repr(k0 * A1)
    conf = f"{_asinh('tan(t_phi)')} - {e!r} * {_atanh(f'{e!r} * sin(t_phi)')}"
    if params is None:
        # datum is WGS84-equivalent: the numpy path projects directly, so
        # the twin must too (no ECEF round trip to diverge from)
        return f"""
    tmg_geo AS (
        SELECT {cr}
               radians(({lon_expr}) - {lon0!r}) AS t_lam,
               radians({lat_expr}) AS t_phi
        FROM {source}
    ),
    tmg_conf AS (
        SELECT {cr}
               {_sinh(conf)} AS t_t,
               atan2({_sinh(conf)}, cos(t_lam)) AS t_xip,
               {_asinh('sin(t_lam) / sqrt(t_t * t_t + cos(t_lam) * cos(t_lam))')} AS t_etap
        FROM tmg_geo
    ),
    tmg_out AS (
        SELECT {cr}
               {fe!r} + {k0a} * (t_etap + {terms_eta}) AS tmg_e,
               {fn!r} + {k0a} * (t_xip + {terms_xi} - {xi0!r}) AS tmg_n
        FROM tmg_conf
    )"""
    return f"""
    tmg_ecef AS (
        SELECT {cr}
               radians({lon_expr}) AS w_lam,
               radians({lat_expr}) AS w_phi,
               {a_w!r} / sqrt(1 - {e2w!r} * sin(w_phi) * sin(w_phi)) AS w_nu,
               w_nu * cos(w_phi) * cos(w_lam) AS g_x,
               w_nu * cos(w_phi) * sin(w_lam) AS g_y,
               w_nu * (1 - {e2w!r}) * sin(w_phi) AS g_z
        FROM {source}
    ),
    tmg_local AS (
        SELECT {cr}{helm}
        FROM tmg_ecef
    ),
    tmg_geo AS (
        SELECT {cr}
               atan2(l_y, l_x) - radians({lon0!r}) AS t_lam,
               sqrt(l_x * l_x + l_y * l_y) AS l_p,
               atan2(l_z * {a_l!r}, l_p * {b_l!r}) AS bw_th,
               sin(bw_th) AS bw_st,
               cos(bw_th) AS bw_ct,
               atan2(l_z + {ep2l!r} * {b_l!r} * bw_st * bw_st * bw_st,
                     l_p - {e2l!r} * {a_l!r} * bw_ct * bw_ct * bw_ct) AS bw_phi,
               sin(bw_phi) AS bw_sp,
               {a_l!r} / sqrt(1 - {e2l!r} * bw_sp * bw_sp) AS bw_nu,
               atan2(l_z + {e2l!r} * bw_nu * bw_sp, l_p) AS t_phi
        FROM tmg_local
    ),
    tmg_conf AS (
        SELECT {cr}
               {_sinh(conf)} AS t_t,
               atan2({_sinh(conf)}, cos(t_lam)) AS t_xip,
               {_asinh('sin(t_lam) / sqrt(t_t * t_t + cos(t_lam) * cos(t_lam))')} AS t_etap
        FROM tmg_geo
    ),
    tmg_out AS (
        SELECT {cr}
               {fe!r} + {k0a} * (t_etap + {terms_eta}) AS tmg_e,
               {fn!r} + {k0a} * (t_xip + {terms_xi} - {xi0!r}) AS tmg_n
        FROM tmg_conf
    )"""


def _compose(f: Transform, g: Transform) -> Transform:
    return lambda xs, ys: g(*f(xs, ys))


def _maybe_build_transform(src: int, dst: int) -> Transform | None:
    """Construct (and cache) a transform for any pair drawn from
    {4326, 3857, UTM zones} by composing through lon/lat.  User-registered
    pairs always win (checked first in resolve_transform)."""

    def to_lonlat(srid: int) -> Transform | None:
        if srid == 4326:
            return lambda xs, ys: (xs, ys)
        if srid == 3857:
            return _webmercator_to_lonlat
        p = utm_zone_params(srid)
        if p is not None:
            cm, n0 = p
            return lambda xs, ys: tm_inverse(xs, ys, cm, n0)
        if srid in _PS_PARAMS:
            return lambda xs, ys: ps_inverse(xs, ys, srid)
        if srid in _LCC_PARAMS:
            return lambda xs, ys: lcc_inverse(xs, ys, srid)
        if srid in _AEA_PARAMS:
            return lambda xs, ys: aea_inverse(xs, ys, srid)
        if srid in _LAEA_PARAMS:
            return lambda xs, ys: laea_inverse(xs, ys, srid)
        if srid in _SINU_PARAMS:
            return lambda xs, ys: sinu_inverse(xs, ys, srid)
        if srid in _MOLL_PARAMS:
            return lambda xs, ys: moll_inverse(xs, ys, srid)
        if srid in _EQC_PARAMS:
            return lambda xs, ys: eqc_inverse(xs, ys, srid)
        if srid in _TM_GRIDS:
            return lambda xs, ys: tmgrid_to_wgs84(xs, ys, srid)
        return None

    def from_lonlat(srid: int) -> Transform | None:
        if srid == 4326:
            return lambda xs, ys: (xs, ys)
        if srid == 3857:
            return _lonlat_to_webmercator
        p = utm_zone_params(srid)
        if p is not None:
            cm, n0 = p
            return lambda xs, ys: tm_forward(xs, ys, cm, n0)
        if srid in _PS_PARAMS:
            return lambda xs, ys: ps_forward(xs, ys, srid)
        if srid in _LCC_PARAMS:
            return lambda xs, ys: lcc_forward(xs, ys, srid)
        if srid in _AEA_PARAMS:
            return lambda xs, ys: aea_forward(xs, ys, srid)
        if srid in _LAEA_PARAMS:
            return lambda xs, ys: laea_forward(xs, ys, srid)
        if srid in _SINU_PARAMS:
            return lambda xs, ys: sinu_forward(xs, ys, srid)
        if srid in _MOLL_PARAMS:
            return lambda xs, ys: moll_forward(xs, ys, srid)
        if srid in _EQC_PARAMS:
            return lambda xs, ys: eqc_forward(xs, ys, srid)
        if srid in _TM_GRIDS:
            return lambda xs, ys: tmgrid_from_wgs84(xs, ys, srid)
        return None

    f = to_lonlat(src)
    g = from_lonlat(dst)
    if f is None or g is None:
        return None
    fn = _compose(f, g)
    _REGISTRY[(src, dst)] = fn
    return fn


def _pyproj_transform(src: int, dst: int) -> Transform | None:
    """Optional-import pyproj adapter — the structural close of the one
    reference behavior the closed-form kernels don't cover: PROJ accepts
    ANY EPSG pair (internal/utils/proj/proj.go:47-73 via godal), while the
    built-in kernels cover the families real satellite products ship in.
    When pyproj is importable, any remaining (src, dst) pair resolves
    through it on demand; when absent (this container), returns None and
    resolve_transform keeps raising CRSError as documented.

    The returned closure carries only the two EPSG ints and builds its
    ``Transformer`` lazily per process: pyproj Transformers are not
    reliably picklable, so the executor re-imports pyproj (installed
    cluster-wide whenever it is on the driver) instead of shipping the
    object by value."""
    try:
        import pyproj  # noqa: F401
    except ImportError:
        return None

    def fn(xs, ys, _cache: list = []):  # noqa: B006 - per-process memo
        if not _cache:
            from pyproj import Transformer

            _cache.append(
                Transformer.from_crs(
                    f"EPSG:{src}", f"EPSG:{dst}", always_xy=True
                )
            )
        x2, y2 = _cache[0].transform(xs, ys)
        return (
            np.asarray(x2, dtype=np.float64),
            np.asarray(y2, dtype=np.float64),
        )

    # fail fast on the driver for an EPSG code PROJ doesn't know either
    try:
        fn(np.array([0.0]), np.array([0.0]))
    except Exception as exc:
        raise CRSError(f"pyproj cannot transform {src} -> {dst}: {exc}") from exc
    return fn


def resolve_transform(src: int, dst: int) -> Transform:
    """Resolve a transform ON THE DRIVER and return the callable itself.

    Operators that ship work to executors (the warp's applyInPandas) must
    resolve here at plan-build time and close over the returned function:
    closures are cloudpickled BY VALUE, so driver-registered transforms
    travel with the task — whereas a registry lookup inside the closure
    would consult the executor's freshly-imported (built-ins-only) module
    registry and fail for any register_transform() addition.  Also fails
    fast on the driver instead of at task runtime.

    Resolution order: explicit register_transform() entries, the
    closed-form kernel families, then — if pyproj is importable — the
    on-demand pyproj adapter (cached in the registry like any plugin)."""
    if src == dst:
        return lambda xs, ys: (xs, ys)
    fn = _REGISTRY.get((src, dst))
    if fn is None:
        fn = _maybe_build_transform(src, dst)
    if fn is None:
        fn = _pyproj_transform(src, dst)
        if fn is not None:
            _REGISTRY[(src, dst)] = fn
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


# ----------------------------------------------- grid-based datum shifts
#
# NTv2-style correction grids (the mechanism PROJ's +nadgrids/NTv2 files
# implement; the reference honors them through PROJ —
# /root/reference/internal/utils/proj/proj.go:47-73): a geographic
# lat/lon lattice of per-node (dlon, dlat) arc-second corrections,
# bilinearly interpolated at the query point and ADDED to go from the
# shifted datum to the base datum.  OSGB36/NAD27-class users need this —
# Helmert alone leaves metre-level residuals that only the empirical grid
# absorbs.  Registered through the same plugin registry as every other
# transform (register_transform), so regrid/warp pick it up untouched.


class ShiftGrid:
    """Uniform geographic lattice of arc-second corrections.

    ``dlon_sec``/``dlat_sec`` are (nrows, ncols) arrays; node (r, c) sits
    at (lon0 + c*step, lat0 + r*step).  Points outside the lattice get
    ZERO shift (GDAL/PROJ NTv2 fallback semantics: no coverage, no
    correction)."""

    def __init__(
        self,
        lon0: float,
        lat0: float,
        step: float,
        dlon_sec: np.ndarray,
        dlat_sec: np.ndarray,
    ):
        self.lon0 = float(lon0)
        self.lat0 = float(lat0)
        self.step = float(step)
        self.dlon_sec = np.asarray(dlon_sec, dtype=np.float64)
        self.dlat_sec = np.asarray(dlat_sec, dtype=np.float64)
        if self.dlon_sec.shape != self.dlat_sec.shape:
            raise CRSError("gridshift: dlon/dlat lattices differ in shape")

    def shift_degrees(
        self, lon: np.ndarray, lat: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Bilinear (dlon_deg, dlat_deg) at each point; zero off-grid."""
        nrows, ncols = self.dlon_sec.shape
        u = (lon - self.lon0) / self.step
        v = (lat - self.lat0) / self.step
        inside = (u >= 0) & (u <= ncols - 1) & (v >= 0) & (v <= nrows - 1)
        # clamp so the gather below is always in-bounds; 'inside' zeroes
        # the result for clamped points afterwards
        c0 = np.clip(np.floor(u), 0, ncols - 2).astype(np.int64)
        r0 = np.clip(np.floor(v), 0, nrows - 2).astype(np.int64)
        fu = u - c0
        fv = v - r0
        w00 = (1.0 - fu) * (1.0 - fv)
        w10 = fu * (1.0 - fv)
        w01 = (1.0 - fu) * fv
        w11 = fu * fv

        def interp(g: np.ndarray) -> np.ndarray:
            val = (
                g[r0, c0] * w00
                + g[r0, c0 + 1] * w10
                + g[r0 + 1, c0] * w01
                + g[r0 + 1, c0 + 1] * w11
            )
            return np.where(inside, val, 0.0)

        return interp(self.dlon_sec) / 3600.0, interp(self.dlat_sec) / 3600.0


def register_gridshift_transform(
    shifted_srid: int, base_srid: int, grid: ShiftGrid, iterations: int = 4
) -> None:
    """Register shifted-datum-geographic <-> base-geographic transforms.

    Forward (shifted -> base) is the direct NTv2 application: add the
    interpolated correction.  Inverse (base -> shifted) is the standard
    fixed-point iteration (PROJ's nadcon/ntv2 inverse): p <- target -
    shift(p), which converges to ~1e-12 deg in a handful of rounds for
    arc-second-scale smooth grids."""

    def fwd(xs: np.ndarray, ys: np.ndarray):
        dlon, dlat = grid.shift_degrees(xs, ys)
        return xs + dlon, ys + dlat

    def inv(xs: np.ndarray, ys: np.ndarray):
        px, py = np.array(xs, dtype=np.float64), np.array(ys, dtype=np.float64)
        for _ in range(iterations):
            dlon, dlat = grid.shift_degrees(px, py)
            px, py = xs - dlon, ys - dlat
        return px, py

    register_transform(shifted_srid, base_srid, fwd)
    register_transform(base_srid, shifted_srid, inv)
