"""Regrid / warp (R2) + resampling kernels (R3) + XYZ tile (R11).

Reference: internal/image/image.go:321-422 (MergeDatasets: per-input cast ->
single warp onto the output grid), resampling enum variable.go:18-61, XYZ
tile math svc/catalog.go:386-506 (z -> resolution = 2πa/(256·2^z)).

Spark-first: each source block is remapped onto target blocks by a numpy
index map inside an Arrow-batched ``applyInPandas`` keyed by the OUTPUT
block — so the shuffle moves each source tile to the output cells it
overlaps (bbox join), and each task assembles one output block from its
gathered inputs.  For the aligned-grid case (same CRS, axis-aligned
affines) the remap is a pure integer index shift — exact, no interpolation
error.  Cross-CRS warps plug the ``functions/crs.py`` transform registry
into the same index-map slot (output pixel centers -> dst->src CRS ->
inverse source affine -> continuous source pixel coords), and the
continuous sample runs through ``functions/resample.sample_grid`` with any
of NEAR / BILINEAR / CUBIC / CUBICSPLINE / LANCZOS (variable.go:18-61);
a real pyproj would register additional (src, dst) pairs unchanged.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from geocube_spark.functions.affine import Affine

# R3 resampling kernels applicable to a 2× downsample window; NEAR/BILINEAR
# apply to the index remap path.
POOL_KERNELS = {
    "AVERAGE": np.mean,
    "MIN": np.min,
    "MAX": np.max,
    "MED": np.median,
    "Q1": lambda a: np.percentile(a, 25),
    "Q3": lambda a: np.percentile(a, 75),
    "MODE": lambda a: np.bincount(a.astype(np.int64).ravel()).argmax(),
}

def _pool_block(
    raster: np.ndarray,
    csx: np.ndarray,
    csy: np.ndarray,
    method: str,
    nd: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Area-pool one output block from corner grids in source-pixel space.

    ``csx``/``csy``: (B+1, B+1) continuous source-pixel coords of the output
    pixel CORNERS (source pixel i has its center at i + 0.5).  Each output
    pixel's window is the axis-aligned bbox of its 4 warped corners; a
    source pixel belongs to the window when its center lies in
    [min, max) — index range [ceil(min-0.5), ceil(max-0.5)-1], the same
    half-open contract the SQL oracle twin re-derives.  An output pixel is
    OWNED by this source image when its window center falls inside the
    raster (mirrors the sample-point ownership of the interpolation path).

    AVERAGE runs on a summed-area table — O(1) per output pixel regardless
    of the downsample factor, so a 100x100 px window costs the same as 2x2
    (the 100 TB case is heavy overview generation, where naive per-window
    mean is O(window) per pixel).  Order statistics (MED/Q1/Q3) and MODE
    have no SAT form; they loop over the block's pixels with vectorized
    window slices (B² tiny numpy ops per block).
    """
    h, w = raster.shape
    b = csx.shape[0] - 1
    x4 = (csx[:-1, :-1], csx[:-1, 1:], csx[1:, :-1], csx[1:, 1:])
    y4 = (csy[:-1, :-1], csy[:-1, 1:], csy[1:, :-1], csy[1:, 1:])
    xm, xM = np.minimum.reduce(x4), np.maximum.reduce(x4)
    ym, yM = np.minimum.reduce(y4), np.maximum.reduce(y4)
    ix_lo = np.ceil(xm - 0.5).astype(np.int64)
    ix_hi = np.ceil(xM - 0.5).astype(np.int64) - 1
    iy_lo = np.ceil(ym - 0.5).astype(np.int64)
    iy_hi = np.ceil(yM - 0.5).astype(np.int64) - 1
    # degenerate window (upsampling through a pooling kernel): fall back to
    # the pixel containing the window center, like GDAL's average does
    cx_mid = ((xm + xM) * 0.5).astype(np.float64)
    cy_mid = ((ym + yM) * 0.5).astype(np.float64)
    mid_ix = np.floor(cx_mid).astype(np.int64)
    mid_iy = np.floor(cy_mid).astype(np.int64)
    ix_lo = np.where(ix_lo > ix_hi, mid_ix, ix_lo)
    ix_hi = np.where(ix_hi < ix_lo, mid_ix, ix_hi)
    iy_lo = np.where(iy_lo > iy_hi, mid_iy, iy_lo)
    iy_hi = np.where(iy_hi < iy_lo, mid_iy, iy_hi)
    own = (
        (cx_mid >= 0) & (cx_mid < w) & (cy_mid >= 0) & (cy_mid < h)
    )
    ix_lo = np.clip(ix_lo, 0, w - 1)
    ix_hi = np.clip(ix_hi, 0, w - 1)
    iy_lo = np.clip(iy_lo, 0, h - 1)
    iy_hi = np.clip(iy_hi, 0, h - 1)
    vals = np.full((b, b), nd)
    valid = (
        ~np.isnan(raster) if math.isnan(nd) else raster != nd
    )
    if method == "AVERAGE":
        # summed-area tables (padded with a zero row/col): window sum and
        # valid count in 4 lookups per output pixel
        vr = np.where(valid, raster, 0.0)
        sat = np.zeros((h + 1, w + 1))
        cnt = np.zeros((h + 1, w + 1), dtype=np.int64)
        np.cumsum(np.cumsum(vr, axis=0), axis=1, out=sat[1:, 1:])
        np.cumsum(np.cumsum(valid, axis=0), axis=1, out=cnt[1:, 1:])

        def rect(tab):
            return (
                tab[iy_hi + 1, ix_hi + 1]
                - tab[iy_lo, ix_hi + 1]
                - tab[iy_hi + 1, ix_lo]
                + tab[iy_lo, ix_lo]
            )

        s, c = rect(sat), rect(cnt)
        nonzero = own & (c > 0)
        vals[nonzero] = s[nonzero] / c[nonzero]
        return vals, own
    kern = POOL_KERNELS[method]
    for r in range(b):
        for c in range(b):
            if not own[r, c]:
                continue
            win = raster[
                iy_lo[r, c] : iy_hi[r, c] + 1, ix_lo[r, c] : ix_hi[r, c] + 1
            ]
            wv = win[
                valid[
                    iy_lo[r, c] : iy_hi[r, c] + 1,
                    ix_lo[r, c] : ix_hi[r, c] + 1,
                ]
            ]
            if wv.size:
                vals[r, c] = kern(wv)
    return vals, own


REGRID_SCHEMA = StructType(
    [
        StructField("out_block_x", IntegerType(), False),
        StructField("out_block_y", IntegerType(), False),
        StructField("record_id", StringType(), False),
        StructField("record_datetime_us", LongType(), False),
        StructField("px", ArrayType(DoubleType()), False),
    ]
)


def regrid_to_grid(
    tiles_with_time: DataFrame,
    out_origin: tuple[float, float],
    out_res: float,
    out_block: int = 64,
    nodata: float = float("nan"),
    resampling: str = "NEAR",
    src_srid: int | None = None,
    dst_srid: int | None = None,
    max_assembled_px: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Remap source tiles onto a north-up target grid (origin, resolution).

    Input rows: tile columns + record_id/record_datetime (for the downstream
    mosaic).  Each source block lands on the output blocks its footprint
    intersects; gaps stay nodata.

    Cross-CRS (image.go:321-422 MergeDatasets' warp): when src_srid !=
    dst_srid, output pixel centers are transformed dst->src through the
    ``functions/crs.py`` registry before the inverse source affine — the
    full inverse-mapping warp.  ``resampling`` picks the continuous kernel
    (NEAR / BILINEAR / CUBIC / CUBICSPLINE / LANCZOS); an output pixel is
    owned by the source block whose index range contains its sample point,
    and wider kernels edge-extend within the block (halo contract noted in
    functions/resample.py).
    """
    from geocube_spark.functions.crs import resolve_transform
    from geocube_spark.functions.resample import INTERP_KERNELS, sample_grid

    pooled = resampling in POOL_KERNELS
    if not pooled and resampling not in INTERP_KERNELS:
        raise ValueError(
            f"resampling {resampling!r}: not an interpolation kernel "
            f"{INTERP_KERNELS} or a pooling kernel {tuple(POOL_KERNELS)}"
        )
    ox, oy = out_origin
    res = float(out_res)
    nd = float(nodata)
    warp = src_srid is not None and dst_srid is not None and src_srid != dst_srid
    # Resolve transforms ON THE DRIVER: the callables are cloudpickled into
    # the task closure by value, so user-registered transforms work on
    # executors (a registry lookup inside the closure would only see the
    # executor module's built-ins) and a missing pair fails at plan build.
    if warp:
        dst_to_src = resolve_transform(dst_srid, src_srid)
        src_to_dst = resolve_transform(src_srid, dst_srid)

    def remap(pdf: pd.DataFrame) -> pd.DataFrame:
        out_blocks: dict[tuple[int, int, str, int], np.ndarray] = {}
        # one sub-image per (record, time, level): assemble the WHOLE
        # container raster so kernel neighborhoods cross block edges exactly
        # (the halo data is already in this task's group — container size
        # bounds the assembly, consolidation caps it by construction).
        # 'level' MUST be in the key where present: blocks from different
        # pyramid levels live on different grids, and interleaving them into
        # one raster would silently corrupt pixels.
        group_keys = ["record_id", "record_datetime_us"]
        if "level" in pdf.columns:
            group_keys.append("level")
        for gk, sub in pdf.groupby(group_keys, sort=False):
            rid, rdt = gk[0], gk[1]
            first = sub.iloc[0]
            gt = Affine.from_struct(first["pix_to_crs"])
            n = int(math.isqrt(len(first["px"])))
            bxs = sub["block_x"].astype(int).to_numpy()
            bys = sub["block_y"].astype(int).to_numpy()
            bx0, bx1 = int(bxs.min()), int(bxs.max())
            by0, by1 = int(bys.min()), int(bys.max())
            n_span_blocks = (bx1 - bx0 + 1) * (by1 - by0 + 1)
            # the raster is allocated densely over the block-index bounding
            # box; cap the span so a sparse container (two far-apart blocks)
            # fails loudly instead of OOMing the task (SCALING.md contract:
            # task memory is bounded by container size, not layout holes)
            if n_span_blocks * n * n > max_assembled_px:
                raise ValueError(
                    f"regrid: group {gk!r} spans {n_span_blocks} blocks of "
                    f"{n}x{n} px ({n_span_blocks * n * n:,} px) — exceeds "
                    f"max_assembled_px={max_assembled_px:,}; the container "
                    "layout is too sparse to assemble densely (split the "
                    "input by block cluster or raise max_assembled_px)"
                )
            w_px = (bx1 - bx0 + 1) * n
            h_px = (by1 - by0 + 1) * n
            raster = np.full((h_px, w_px), nd)
            first_gt = (gt.a, gt.b, gt.c, gt.d, gt.e, gt.f)
            for _, row in sub.iterrows():
                row_gt = Affine.from_struct(row["pix_to_crs"])
                if (row_gt.a, row_gt.b, row_gt.c, row_gt.d, row_gt.e, row_gt.f) != first_gt:
                    raise ValueError(
                        f"regrid: group {gk!r} mixes affines "
                        f"{first_gt} and {row_gt} — heterogeneous grids in "
                        "one (record, time, level) group"
                    )
                px = np.asarray(row["px"], dtype=np.float64)
                if len(px) != n * n:
                    raise ValueError(
                        f"regrid: group {gk!r} mixes block sizes "
                        f"({len(px)} px vs {n * n}) in one group"
                    )
                r0 = (int(row["block_y"]) - by0) * n
                c0 = (int(row["block_x"]) - bx0) * n
                raster[r0 : r0 + n, c0 : c0 + n] = px.reshape(n, n)
            inv = gt.inverse()
            # raster corner coords in SOURCE CRS
            gx0, gy0 = gt.apply(bx0 * n, by0 * n)
            gx1, gy1 = gt.apply((bx1 + 1) * n, (by1 + 1) * n)
            sxmin, sxmax = min(gx0, gx1), max(gx0, gx1)
            symin, symax = min(gy0, gy1), max(gy0, gy1)
            if warp:
                # footprint in OUTPUT CRS via densified boundary (curved
                # projections bow edges — same contract as warped_extent)
                from geocube_spark.functions.crs import warped_extent_with

                wx0, wy0, wx1, wy1 = warped_extent_with(
                    src_to_dst, sxmin, symin, sxmax, symax
                )
            else:
                wx0, wy0, wx1, wy1 = sxmin, symin, sxmax, symax
            # footprint in output pixel space (north-up: y grows downward)
            x_lo = (wx0 - ox) / res
            x_hi = (wx1 - ox) / res
            y_lo = (oy - wy1) / res
            y_hi = (oy - wy0) / res
            for oby in range(
                int(math.floor(y_lo / out_block)), int(math.ceil(y_hi / out_block))
            ):
                for obx in range(
                    int(math.floor(x_lo / out_block)), int(math.ceil(x_hi / out_block))
                ):
                    if pooled:
                        # area-pooling under warp (GDAL -r average/mode/med
                        # during reprojection, image.go:396-408 + the
                        # variable.go:18-61 enum): map each OUTPUT pixel's 4
                        # corners dst->src, pool the source pixels whose
                        # centers fall in the corner-bounded window
                        ex = (
                            np.arange(out_block + 1) + obx * out_block
                        ) * res + ox
                        ey = oy - (
                            np.arange(out_block + 1) + oby * out_block
                        ) * res
                        gx, gy = np.meshgrid(ex, ey)
                        if warp:
                            gx, gy = dst_to_src(gx, gy)
                        csx = inv.a * gx + inv.b * gy + inv.c - bx0 * n
                        csy = inv.d * gx + inv.e * gy + inv.f - by0 * n
                        vals, own = _pool_block(
                            raster, csx, csy, resampling, nd
                        )
                        if not own.any():
                            continue
                        key = (obx, oby, rid, int(rdt))
                        buf = out_blocks.get(key)
                        if buf is None:
                            buf = np.full((out_block, out_block), nd)
                            out_blocks[key] = buf
                        buf[own] = vals[own]
                        continue
                    # output pixel centers of this block, in OUTPUT CRS
                    cols = (np.arange(out_block) + obx * out_block + 0.5) * res + ox
                    rows_ = oy - (np.arange(out_block) + oby * out_block + 0.5) * res
                    if warp:
                        cx, cy = np.meshgrid(cols, rows_)
                        cx, cy = dst_to_src(cx, cy)
                        sx = inv.a * cx + inv.b * cy + inv.c
                        sy = inv.d * cx + inv.e * cy + inv.f
                    else:
                        # axis-aligned affine (b=d=0): separable 1-D maps
                        sx1 = inv.a * cols + inv.b * rows_.mean() + inv.c
                        sy1 = inv.d * cols.mean() + inv.e * rows_ + inv.f
                        sx, sy = np.meshgrid(sx1, sy1)
                    # raster-local continuous coords; this image owns the
                    # output pixels whose sample point falls inside it
                    sxl = sx - bx0 * n
                    syl = sy - by0 * n
                    own = (
                        (np.floor(sxl) >= 0)
                        & (np.floor(sxl) < w_px)
                        & (np.floor(syl) >= 0)
                        & (np.floor(syl) < h_px)
                    )
                    if not own.any():
                        continue
                    sampled = sample_grid(
                        raster, sxl, syl, method=resampling, nodata=nd, src_nodata=nd
                    )
                    key = (obx, oby, rid, int(rdt))
                    buf = out_blocks.get(key)
                    if buf is None:
                        buf = np.full((out_block, out_block), nd)
                        out_blocks[key] = buf
                    buf[own] = sampled[own]
        rows_out = [
            {
                "out_block_x": k[0],
                "out_block_y": k[1],
                "record_id": k[2],
                "record_datetime_us": k[3],
                "px": v.ravel().tolist(),
            }
            for k, v in out_blocks.items()
        ]
        return pd.DataFrame(
            rows_out, columns=[f.name for f in REGRID_SCHEMA.fields]
        )

    prepared = tiles_with_time.withColumn(
        "record_datetime_us", F.unix_micros(F.col("record_datetime").cast("timestamp"))
    )
    # group by source container: each task remaps its own blocks; the result
    # is re-grouped by output block downstream (mosaic groupBy)
    return prepared.groupBy("container_uri", "band").applyInPandas(
        lambda _, pdf: remap(pdf), REGRID_SCHEMA
    )


# ----------------------------------------------------------------- XYZ (R11)

_WEB_MERCATOR_EXTENT = 2 * math.pi * 6378137.0  # full-earth extent in EPSG:3857


def xyz_tile_grid(x: int, y: int, z: int, tile_px: int = 256) -> tuple[tuple[float, float], float]:
    """WebMercator XYZ tile -> (origin, resolution) of its 256² pixel grid.
    resolution = 2πa / (256·2^z) (svc/catalog.go:415-429)."""
    res = _WEB_MERCATOR_EXTENT / (tile_px * (1 << z))
    half = _WEB_MERCATOR_EXTENT / 2
    ox = -half + x * tile_px * res
    oy = half - y * tile_px * res
    return (ox, oy), res


def xyz_tile(
    tiles_with_time: DataFrame,
    x: int,
    y: int,
    z: int,
    nodata: float = float("nan"),
    tile_px: int = 256,
    base_res: float | None = None,
    max_level: int = 0,
    src_srid: int | None = None,
) -> DataFrame:
    """R11: regrid + mosaic onto one XYZ WebMercator tile; PNG/palette
    encoding (S7/C10) happens at the edge (see registry.xyz_tile_png for
    the full GetXYZTile->palette->PNG consumer path).

    ``src_srid``: CRS of the source tile table when it is NOT WebMercator
    — the reference warps whatever CRS the datasets live in onto the
    mercator tile grid (svc/catalog.go:386-506 via MergeDatasets).  Left
    None, the input is assumed 3857-native and no warp happens.

    O8 (-ovr AUTO, image.go:402): when ``base_res`` is given and the
    input carries a ``level`` column, the coarsest overview whose
    resolution still covers this zoom's output resolution is selected as
    a driver literal — zoomed-out tiles prune the full-res scan away
    instead of pooling it down."""
    from geocube_spark.operators.mosaic import mosaic_blocks
    from geocube_spark.plans.overview import scan_at_overview

    (ox, oy), res = xyz_tile_grid(x, y, z, tile_px)
    if base_res is not None and "level" in tiles_with_time.columns:
        tiles_with_time, _ = scan_at_overview(
            tiles_with_time, base_res, res, max_level
        )
    regridded = regrid_to_grid(
        tiles_with_time,
        (ox, oy),
        res,
        out_block=tile_px,
        nodata=nodata,
        src_srid=src_srid,
        dst_srid=None if src_srid is None else 3857,
    )
    only = regridded.filter((F.col("out_block_x") == 0) & (F.col("out_block_y") == 0))
    stacked = only.select(
        F.lit(1).cast("smallint").alias("band"),
        F.lit(0).cast("smallint").alias("level"),
        F.col("out_block_x").alias("block_x"),
        F.col("out_block_y").alias("block_y"),
        "px",
        F.timestamp_micros(F.col("record_datetime_us")).alias("record_datetime"),
        "record_id",
    )
    return mosaic_blocks(stacked, nodata=nodata)
