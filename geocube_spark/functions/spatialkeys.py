"""Space-filling-curve keys: Morton (Z-order) and geohash.

Both are data-LAYOUT tools at 100 TB: sorting tile files by Morton key
(``sortWithinPartitions(zorder_expr(...))`` in the consolidation sink, or
a cluster-by on ingest) makes 2D range reads touch contiguous byte ranges
— the same locality the MuCOG interlacing pattern buys for time series,
applied to the spatial axes.  Geohash gives points a prefix-searchable
cell id (prefix LIKE = bbox candidate filter that pushes down to the
scan).

Everything is closed-form integer bit arithmetic (unrolled shift/mask
sums — no UDF, whole-stage codegen), so the DuckDB oracles replay the
exact same math.  Geohash is the public Niemeyer scheme (base32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``, longitude first).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def zorder_expr(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` of x (even positions) and
    y (odd positions).  bits <= 31 keeps everything in a long."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    xi = x.cast("long")
    yi = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xi, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yi, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _quantized(lon: Column, lat: Column, precision: int):
    n = 5 * precision
    lon_bits = (n + 1) // 2
    lat_bits = n // 2
    # clamp BOTH ends: a coordinate a float-ulp outside the domain would
    # otherwise quantize to -1, whose sign bits corrupt the whole key
    qlon = F.greatest(
        F.lit(0),
        F.least(
            F.lit((1 << lon_bits) - 1),
            F.floor((lon + 180.0) / 360.0 * (1 << lon_bits)).cast("long"),
        ),
    )
    qlat = F.greatest(
        F.lit(0),
        F.least(
            F.lit((1 << lat_bits) - 1),
            F.floor((lat + 90.0) / 180.0 * (1 << lat_bits)).cast("long"),
        ),
    )
    return qlon, qlat, n, lon_bits, lat_bits


def geohash_int_expr(lon: Column, lat: Column, precision: int = 6) -> Column:
    """The 5·precision-bit interleaved geohash integer (lon takes the MSB
    and every even position thereafter — the standard scheme)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    qlon, qlat, n, lon_bits, lat_bits = _quantized(lon, lat, precision)
    z = F.lit(0).cast("long")
    for k in range(lon_bits):  # MSB-first lon bit k -> combined bit n-1-2k
        z = z + F.shiftleft(
            F.shiftright(qlon, lon_bits - 1 - k).bitwiseAND(F.lit(1)),
            n - 1 - 2 * k,
        )
    for k in range(lat_bits):  # lat bit k -> combined bit n-2-2k
        z = z + F.shiftleft(
            F.shiftright(qlat, lat_bits - 1 - k).bitwiseAND(F.lit(1)),
            n - 2 - 2 * k,
        )
    return z


def geohash_expr(lon: Column, lat: Column, precision: int = 6) -> Column:
    """Base32 geohash string of the given precision."""
    z = geohash_int_expr(lon, lat, precision)
    chars = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            (F.shiftright(z, 5 * (precision - 1 - g)).bitwiseAND(F.lit(31)) + 1).cast(
                "int"
            ),
            1,
        )
        for g in range(precision)
    ]
    return F.concat(*chars)


def geohash_int_sql(lon: str, lat: str, precision: int = 6) -> str:
    n = 5 * precision
    lon_bits = (n + 1) // 2
    lat_bits = n // 2
    qlon = (
        f"greatest(0, least({(1 << lon_bits) - 1}, "
        f"CAST(floor(({lon} + 180.0) / 360.0 * {1 << lon_bits}) AS BIGINT)))"
    )
    qlat = (
        f"greatest(0, least({(1 << lat_bits) - 1}, "
        f"CAST(floor(({lat} + 90.0) / 180.0 * {1 << lat_bits}) AS BIGINT)))"
    )
    terms = []
    for k in range(lon_bits):
        terms.append(f"((({qlon} >> {lon_bits - 1 - k}) & 1) << {n - 1 - 2 * k})")
    for k in range(lat_bits):
        terms.append(f"((({qlat} >> {lat_bits - 1 - k}) & 1) << {n - 2 - 2 * k})")
    return "(" + " + ".join(terms) + ")"


def geohash_sql(lon: str, lat: str, precision: int = 6) -> str:
    z = geohash_int_sql(lon, lat, precision)
    chars = [
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST((({z} >> {5 * (precision - 1 - g)}) & 31) + 1 AS INT), 1)"
        for g in range(precision)
    ]
    return " || ".join(chars)


# ----------------------------------------------------- Bing quadkeys
#
# Microsoft Bing Maps tile-key scheme (the third common spatial key next
# to geohash and Morton): the XYZ tile address interleaves into a base-4
# string whose PREFIXES are ancestors — zoom-out = string truncation,
# range scans cover whole subtrees.  Digit l (from the top): bit (z-l) of
# x plus twice bit (z-l) of y.


def quadkey_from_xyz_expr(tx: Column, ty: Column, z: int) -> Column:
    """XYZ tile (tx, ty) at fixed zoom ``z`` -> quadkey string (length z).
    Pure JVM: z unrolled shift-and-mask digit expressions concatenated
    (z <= 23, so the unroll is tiny and stays in codegen)."""
    txl, tyl = tx.cast("long"), ty.cast("long")
    digits = [
        (
            F.shiftright(txl, l - 1).bitwiseAND(F.lit(1))
            + F.shiftright(tyl, l - 1).bitwiseAND(F.lit(1)) * 2
        ).cast("string")
        for l in range(int(z), 0, -1)
    ]
    return F.concat_ws("", *digits)


def quadkey_from_xyz_sql(tx: str, ty: str, z: int) -> str:
    """DuckDB twin of :func:`quadkey_from_xyz_expr`."""
    return (
        f"list_aggregate(list_transform(generate_series({int(z)}, 1, -1), "
        f"l -> CAST((({tx} >> (l - 1)) & 1) + 2 * ((({ty}) >> (l - 1)) & 1) "
        f"AS VARCHAR)), 'string_agg', '')"
    )


def lonlat_to_tile_expr(lon: Column, lat: Column, z: int) -> tuple[Column, Column]:
    """WebMercator XYZ tile indices for a lon/lat point at zoom ``z`` —
    the slippy-map formula, clamped to the valid tile range."""
    n = F.lit(float(1 << int(z)))
    tx = F.floor((lon + 180.0) / 360.0 * n)
    lat_r = F.radians(lat)
    ty = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / F.lit(math.pi))
        / 2.0
        * n
    )
    clamp = lambda c: F.greatest(  # noqa: E731
        F.lit(0), F.least(c.cast("long"), F.lit((1 << int(z)) - 1))
    )
    return clamp(tx), clamp(ty)


def lonlat_to_tile_sql(lon: str, lat: str, z: int) -> tuple[str, str]:
    n = float(1 << int(z))
    tx = (
        f"greatest(0, least(CAST(floor((({lon}) + 180.0) / 360.0 * {n}) AS "
        f"BIGINT), {(1 << int(z)) - 1}))"
    )
    ty = (
        f"greatest(0, least(CAST(floor((1.0 - ln(tan(radians({lat})) + 1.0 / "
        f"cos(radians({lat}))) / pi()) / 2.0 * {n}) AS BIGINT), "
        f"{(1 << int(z)) - 1}))"
    )
    return tx, ty
