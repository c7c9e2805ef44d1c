"""Focal (neighborhood) raster ops with distributed halo exchange.

A focal op (3×3 mean here; the pattern generalizes to any kernel radius)
needs each pixel's neighbors — which, at tile edges, live in ADJACENT
tiles.  The single-node answer is "read the whole raster"; the
distributed answer is a HALO EXCHANGE: every tile ships only its r-deep
edge strips to its 8 neighbors, each tile assembles a (block+2r)² padded
window, and the kernel then runs purely locally.

Plan shape: one narrow pass emits 9 (neighbor_key, strip) rows per tile
(the strips are r·block values — for r=1, 1/64th of the tile, so the
shuffle is O(pixels/block·r), ~1.6 % of the raster at block=64, NOT
O(pixels)); one groupBy(block) assembles windows; the kernel is a numpy
stencil inside applyInPandas (vectorized, per-block).  Raster edges use
edge clamping (nearest-pixel replication).

Point sampling (`sample_points`) is the degenerate case: map each point
to its (block, index), broadcast-join the points against the tile table,
element_at the px array — an O(#points) probe, no raster shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_points(
    tiles: DataFrame,
    points: DataFrame,
    transform: tuple[float, float, float, float, float, float],
    block: int = 64,
    px_col: str = "px",
) -> DataFrame:
    """Extract the raster value under each point (training-data extraction
    at label locations).  ``points``: (point_id, x, y) in the tile CRS;
    ``transform``: the grid's (a, b, c, d, e, f) affine — a scalar of the
    sampling call, so the point-side block keys are computable WITHOUT
    touching the tile row and the join is a true BroadcastHashJoin on
    (block_x, block_y): each point probes exactly one block, no raster
    shuffle, no nested-loop fallback."""
    a, _b, c, _d, e, f0 = transform
    keyed = points.select(
        "point_id",
        F.floor((F.col("x") - c) / a).cast("long").alias("gi"),
        F.floor((F.col("y") - f0) / e).cast("long").alias("gj"),
    ).select(
        "point_id",
        "gi",
        "gj",
        F.floor(F.col("gi") / block).alias("block_x"),
        F.floor(F.col("gj") / block).alias("block_y"),
    )
    joined = tiles.join(F.broadcast(keyed), ["block_x", "block_y"])
    # pmod, not %: Spark's % is sign-preserving, and grids extending west/
    # north of the origin have negative global indices (regrid emits
    # negative blocks) — a negative in-block offset would silently read
    # from the END of the px array via element_at's negative indexing
    idx = (
        F.pmod(F.col("gj"), F.lit(block)) * block
        + F.pmod(F.col("gi"), F.lit(block))
        + 1
    )
    carry = [k for k in ("band", "level") if k in tiles.columns]
    return joined.select(
        "point_id",
        *carry,
        F.element_at(F.col(px_col), idx.cast("int")).alias("value"),
    )


def _mean_kernel(pad: np.ndarray) -> np.ndarray:
    """3×3 mean over the padded window."""
    return (
        pad[:-2, :-2] + pad[:-2, 1:-1] + pad[:-2, 2:]
        + pad[1:-1, :-2] + pad[1:-1, 1:-1] + pad[1:-1, 2:]
        + pad[2:, :-2] + pad[2:, 1:-1] + pad[2:, 2:]
    ) / 9.0


def horn_slope_kernel(cellsize: float):
    """Horn's method (the gdaldem slope algorithm): slope = atan(√(zx²+zy²))
    with zx/zy the 3rd-order finite differences over the 3×3 window,
    weighted 1-2-1, divided by 8·cellsize.  Returns radians."""

    def kernel(pad: np.ndarray) -> np.ndarray:
        zx, zy = _horn_derivatives(pad, cellsize)
        return np.arctan(np.sqrt(zx * zx + zy * zy))

    return kernel


def hillshade_kernel(
    cellsize: float,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
):
    """GDAL-style analytical hillshade: Horn derivatives then
    255 · (cos(zenith)·cos(slope) + sin(zenith)·sin(slope)·cos(az − aspect)),
    clamped at 0 — the standard cartographic relief shading."""
    zenith = np.radians(90.0 - altitude_deg)
    az = np.radians(360.0 - azimuth_deg + 90.0)

    def kernel(pad: np.ndarray) -> np.ndarray:
        zx, zy = _horn_derivatives(pad, cellsize, z_factor)
        slope = np.arctan(np.sqrt(zx * zx + zy * zy))
        aspect = np.arctan2(zy, -zx)
        shade = 255.0 * (
            np.cos(zenith) * np.cos(slope)
            + np.sin(zenith) * np.sin(slope) * np.cos(az - aspect)
        )
        return np.maximum(shade, 0.0)

    return kernel


def focal_hillshade(
    tiles: DataFrame,
    cellsize: float,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
    block: int = 64,
    px_col: str = "px",
) -> DataFrame:
    """Analytical hillshade over the tile table (same halo-exchange plan)."""
    return focal_apply(
        tiles,
        hillshade_kernel(cellsize, azimuth_deg, altitude_deg, z_factor),
        block=block,
        px_col=px_col,
    )


def focal_mean(
    tiles: DataFrame,
    block: int = 64,
    px_col: str = "px",
) -> DataFrame:
    """3×3 focal mean over the full raster via halo exchange."""
    return focal_apply(tiles, _mean_kernel, block=block, px_col=px_col)


def focal_slope(
    tiles: DataFrame,
    cellsize: float,
    block: int = 64,
    px_col: str = "px",
) -> DataFrame:
    """Horn slope (radians) — terrain analysis over the tile table with
    the same halo-exchange plan as focal_mean."""
    return focal_apply(
        tiles, horn_slope_kernel(cellsize), block=block, px_col=px_col
    )


def _horn_derivatives(pad, cellsize: float, z_factor: float = 1.0):
    """(zx, zy) Horn 3rd-order finite differences (1-2-1 weights over
    8·cellsize) on a radius-1 padded window — shared by slope, aspect and
    hillshade so the stencil exists exactly once."""
    zx = (
        (pad[:-2, 2:] + 2.0 * pad[1:-1, 2:] + pad[2:, 2:])
        - (pad[:-2, :-2] + 2.0 * pad[1:-1, :-2] + pad[2:, :-2])
    ) / (8.0 * cellsize) * z_factor
    zy = (
        (pad[2:, :-2] + 2.0 * pad[2:, 1:-1] + pad[2:, 2:])
        - (pad[:-2, :-2] + 2.0 * pad[:-2, 1:-1] + pad[:-2, 2:])
    ) / (8.0 * cellsize) * z_factor
    return zx, zy


def horn_aspect_kernel(cellsize: float):
    """Aspect (downslope direction) from Horn derivatives, GDAL
    convention: degrees clockwise from north in [0, 360); flat cells
    (both derivatives zero) report -1 like gdaldem's flat flag."""

    def kernel(pad: np.ndarray) -> np.ndarray:
        zx, zy = _horn_derivatives(pad, cellsize)
        az = np.degrees(np.arctan2(zy, -zx))  # math convention, CCW from +x
        aspect = np.mod(450.0 - az, 360.0)  # -> CW from north
        flat = (zx == 0.0) & (zy == 0.0)
        return np.where(flat, -1.0, aspect)

    return kernel


def focal_aspect(
    tiles: DataFrame,
    cellsize: float,
    block: int = 64,
    px_col: str = "px",
) -> DataFrame:
    """Horn aspect (degrees CW from north; -1 for flat) — completes the
    slope/aspect/hillshade terrain trio on the halo-exchange plan."""
    return focal_apply(
        tiles, horn_aspect_kernel(cellsize), block=block, px_col=px_col
    )


def nan_mean_kernel():
    """3×3 mean that IGNORES NaN neighbors (nodata-as-NaN rasters, C14
    convention): each output is the mean of the valid values in its
    window; a fully-invalid window stays NaN."""

    def kernel(pad: np.ndarray) -> np.ndarray:
        b = pad.shape[0] - 2
        acc = np.zeros((b, b))
        cnt = np.zeros((b, b))
        for di in range(3):
            for dj in range(3):
                w = pad[di:di + b, dj:dj + b]
                valid = ~np.isnan(w)
                acc += np.where(valid, w, 0.0)
                cnt += valid
        with np.errstate(invalid="ignore"):
            return np.where(cnt > 0, acc / np.maximum(cnt, 1), np.nan)

    return kernel


def gaussian5_kernel():
    """5×5 binomial (Gaussian-approximating) smoothing: the outer product
    of [1, 4, 6, 4, 1] / 256 — radius-2 showcase of the general halo."""
    w1 = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    w = np.outer(w1, w1) / 256.0

    def kernel(pad: np.ndarray) -> np.ndarray:
        b = pad.shape[0] - 4
        out = np.zeros((b, b))
        for di in range(5):
            for dj in range(5):
                out += w[di, dj] * pad[di:di + b, dj:dj + b]
        return out

    return kernel


def focal_gaussian(
    tiles: DataFrame,
    block: int = 64,
    px_col: str = "px",
) -> DataFrame:
    """5×5 binomial smoothing via the radius-2 halo exchange."""
    return focal_apply(
        tiles, gaussian5_kernel(), block=block, px_col=px_col, radius=2
    )


def focal_apply(
    tiles: DataFrame,
    kernel,
    block: int = 64,
    px_col: str = "px",
    radius: int = 1,
) -> DataFrame:
    """Run an arbitrary (2·radius+1)²-window kernel over the full raster
    via halo exchange.  ``kernel`` receives the (block+2r)² padded window
    and returns the block² output.  Returns the tile table shape with
    ``px`` replaced by the kernel output.  Raster borders clamp (edge
    replication); interior tile edges are exact because each tile
    receives its neighbors' r-px strips.  radius must stay < block
    (multi-hop halos are a deployment variant, not implemented).
    """
    r = radius
    if not 1 <= r < block:
        raise ValueError("radius must be in [1, block)")
    n = block * block
    idx = F.sequence(F.lit(0), F.lit(n - 1))

    # strip extraction: the neighbor in direction (dx, dy) needs this
    # tile's facing r-deep edge — r columns for horizontal neighbors, r
    # rows for vertical ones, an r×r corner for diagonals.  Row-major
    # filter order is preserved, so the receiver reshapes directly.
    def strip(dx: int, dy: int):
        def pred(i):
            conds = []
            if dx == -1:
                conds.append(i % block < r)
            elif dx == 1:
                conds.append(i % block >= block - r)
            if dy == -1:
                conds.append(F.floor(i / block) < r)
            elif dy == 1:
                conds.append(F.floor(i / block) >= block - r)
            out = conds[0]
            for c in conds[1:]:
                out = out & c
            return out

        sel = F.filter(idx, pred)
        return F.transform(
            sel, lambda i: F.element_at(px_col, (i + 1).cast("int"))
        )

    # emit (target_block, dx, dy, strip_values) for the 8 neighbors plus
    # the tile body itself (dx = dy = 0, full array)
    # a tile table carries one row per (band, level, block); halo exchange
    # and assembly must stay within each (band, level) plane or multiband
    # input would mix planes nondeterministically
    carry = [k for k in ("band", "level") if k in tiles.columns]
    pieces = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            payload = F.col(px_col) if dx == 0 and dy == 0 else strip(dx, dy)
            pieces.append(
                F.struct(
                    (F.col("block_x") + dx).alias("tgt_x"),
                    (F.col("block_y") + dy).alias("tgt_y"),
                    F.lit(-dx).alias("dx"),  # direction as seen by target
                    F.lit(-dy).alias("dy"),
                    payload.alias("vals"),
                )
            )
    exploded = tiles.select(
        *carry, "block_x", "block_y", px_col,
        F.explode(F.array(*pieces)).alias("m"),
    ).select(
        *carry,
        F.col("m.tgt_x").alias("block_x"),
        F.col("m.tgt_y").alias("block_y"),
        F.col("m.dx").alias("dx"),
        F.col("m.dy").alias("dy"),
        F.col("m.vals").alias("vals"),
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        bx = int(pdf["block_x"].iloc[0])
        by = int(pdf["block_y"].iloc[0])
        keys = {k: [pdf[k].iloc[0]] for k in carry}
        body = None
        pad = np.full((block + 2 * r, block + 2 * r), np.nan)
        core = slice(r, r + block)
        for _, row in pdf.iterrows():  # <= 9 rows per group
            vals = np.asarray(row["vals"], dtype=np.float64)
            dx, dy = int(row["dx"]), int(row["dy"])
            if dx == 0 and dy == 0:
                if vals.size != block * block:
                    continue
                body = vals.reshape(block, block)
                pad[core, core] = body
            elif dx == 0:  # vertical neighbor: r×block row band
                if vals.size == r * block:
                    band = vals.reshape(r, block)
                    pad[slice(0, r) if dy == -1 else slice(r + block, None), core] = band
            elif dy == 0:  # horizontal neighbor: block×r column band
                if vals.size == block * r:
                    band = vals.reshape(block, r)
                    pad[core, slice(0, r) if dx == -1 else slice(r + block, None)] = band
            else:  # diagonal: r×r corner
                if vals.size == r * r:
                    corner = vals.reshape(r, r)
                    rs = slice(0, r) if dy == -1 else slice(r + block, None)
                    cs = slice(0, r) if dx == -1 else slice(r + block, None)
                    pad[rs, cs] = corner
        if body is None:  # halo rows addressed to a nonexistent tile
            return pd.DataFrame(
                {
                    **{k: pd.Series([], dtype="int64") for k in carry},
                    "block_x": pd.Series([], dtype="int64"),
                    "block_y": pd.Series([], dtype="int64"),
                    "px": pd.Series([], dtype="object"),
                }
            )
        # raster edge: clamp (edge replication, matching np.pad mode=edge
        # on the full raster).  Replicate the nearest filled row across
        # the WHOLE pad width — including halo columns — then columns, so
        # corners land on the neighbor's clamped pixel; a doubly-missing
        # corner resolves to the nearest body pixel, exactly like np.pad.
        if np.isnan(pad[:r, core]).all():
            pad[:r, :] = pad[r:r + 1, :]
        if np.isnan(pad[r + block:, core]).all():
            pad[r + block:, :] = pad[r + block - 1:r + block, :]
        if np.isnan(pad[core, :r]).all():
            pad[:, :r] = pad[:, r:r + 1]
        if np.isnan(pad[core, r + block:]).all():
            pad[:, r + block:] = pad[:, r + block - 1:r + block]
        # sparse coverage fallback: a diagonal hole between two present
        # neighbors (can't happen on a gap-free grid) clamps sideways
        for rs, cs in (
            (slice(0, r), slice(0, r)),
            (slice(0, r), slice(r + block, None)),
            (slice(r + block, None), slice(0, r)),
            (slice(r + block, None), slice(r + block, None)),
        ):
            if np.isnan(pad[rs, cs]).any():
                fill = pad[rs, r:r + 1] if cs == slice(0, r) else pad[rs, r + block - 1:r + block]
                pad[rs, cs] = fill
        out = kernel(pad)
        return pd.DataFrame(
            {**keys, "block_x": [bx], "block_y": [by],
             "px": [out.ravel().tolist()]}
        )

    schema = ", ".join(
        [f"{k} long" for k in carry]
        + ["block_x long", "block_y long", "px array<double>"]
    )
    return exploded.groupBy(*carry, "block_x", "block_y").applyInPandas(
        assemble, schema
    )


def erode_kernel(radius: int = 1):
    """Morphological EROSION (grayscale min filter) over the square
    (2r+1)² structuring element — with dilate, the building block of the
    cloud/shadow-mask cleanups (opening = erode∘dilate removes speckle,
    closing = dilate∘erode fills pinholes; gdal_sieve territory)."""

    def kernel(pad: np.ndarray) -> np.ndarray:
        b = pad.shape[0] - 2 * radius
        out = pad[radius : radius + b, radius : radius + b].copy()
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                out = np.minimum(
                    out, pad[radius + dy : radius + dy + b, radius + dx : radius + dx + b]
                )
        return out

    return kernel


def dilate_kernel(radius: int = 1):
    """Morphological DILATION (grayscale max filter)."""

    def kernel(pad: np.ndarray) -> np.ndarray:
        b = pad.shape[0] - 2 * radius
        out = pad[radius : radius + b, radius : radius + b].copy()
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                out = np.maximum(
                    out, pad[radius + dy : radius + dy + b, radius + dx : radius + dx + b]
                )
        return out

    return kernel


def focal_erode(tiles: DataFrame, block: int = 64, radius: int = 1, px_col: str = "px") -> DataFrame:
    return focal_apply(tiles, erode_kernel(radius), block=block, px_col=px_col, radius=radius)


def focal_dilate(tiles: DataFrame, block: int = 64, radius: int = 1, px_col: str = "px") -> DataFrame:
    return focal_apply(tiles, dilate_kernel(radius), block=block, px_col=px_col, radius=radius)


def tri_kernel():
    """Terrain Ruggedness Index (Riley et al. 1999, the gdaldem TRI
    default): mean absolute difference between the center cell and its 8
    neighbors."""

    def kernel(pad: np.ndarray) -> np.ndarray:
        b = pad.shape[0] - 2
        c = pad[1 : 1 + b, 1 : 1 + b]
        acc = np.zeros_like(c)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                acc += np.abs(pad[1 + dy : 1 + dy + b, 1 + dx : 1 + dx + b] - c)
        return acc / 8.0

    return kernel


def tpi_kernel():
    """Topographic Position Index (gdaldem TPI): center minus the mean of
    its 8 neighbors — positive on ridges, negative in valleys."""

    def kernel(pad: np.ndarray) -> np.ndarray:
        b = pad.shape[0] - 2
        c = pad[1 : 1 + b, 1 : 1 + b]
        acc = np.zeros_like(c)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                acc += pad[1 + dy : 1 + dy + b, 1 + dx : 1 + dx + b]
        return c - acc / 8.0

    return kernel


def roughness_kernel():
    """gdaldem roughness: max - min of the full 3x3 window."""

    def kernel(pad: np.ndarray) -> np.ndarray:
        b = pad.shape[0] - 2
        mx = pad[1 : 1 + b, 1 : 1 + b].copy()
        mn = mx.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                w = pad[1 + dy : 1 + dy + b, 1 + dx : 1 + dx + b]
                np.maximum(mx, w, out=mx)
                np.minimum(mn, w, out=mn)
        return mx - mn

    return kernel


def focal_tri(tiles: DataFrame, block: int = 64, px_col: str = "px") -> DataFrame:
    return focal_apply(tiles, tri_kernel(), block=block, px_col=px_col)


def focal_tpi(tiles: DataFrame, block: int = 64, px_col: str = "px") -> DataFrame:
    return focal_apply(tiles, tpi_kernel(), block=block, px_col=px_col)


def focal_roughness(tiles: DataFrame, block: int = 64, px_col: str = "px") -> DataFrame:
    return focal_apply(tiles, roughness_kernel(), block=block, px_col=px_col)
